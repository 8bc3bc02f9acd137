"""Compile-time regression guard (VERDICT r4 Next #8).

The r2→r3 compile creep (steady-state select() compile 1.6 s) hid
inside query wall for two rounds before it was found.  This pins the
steady-state compile cost of a canonical 3-pattern + BIND + FILTER
query under a committed budget; if a future change regresses driver-
side plan construction, this test fails instead of the bench silently
absorbing it.  Budget is ~1.5× the r4 steady-state (0.54 s) to stay
robust to machine jitter while still catching a 2× regression.
"""

import time

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "urn:ex:"

COMPILE_BUDGET_SEC = 0.8

QUERY = f"""
SELECT ?s ?nm ?twice WHERE {{
  ?s <{EX}type> <{EX}T> .
  ?s <{EX}name> ?nm .
  ?s <{EX}val> ?v .
  BIND(?v * 2 AS ?twice)
  FILTER(?twice > 10)
}}"""


def test_steady_state_compile_under_budget(spark):
    trips = [
        (Term.iri(EX + "a"), Term.iri(EX + "type"), Term.iri(EX + "T")),
        (Term.iri(EX + "a"), Term.iri(EX + "name"), Term.literal("A")),
        (Term.iri(EX + "a"), Term.iri(EX + "val"), Term.literal("9", dt="http://www.w3.org/2001/XMLSchema#integer")),
    ]
    e = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    e.select(QUERY)  # warm the literal/term memos + JVM paths
    best = min(
        (lambda t0: (e.select(QUERY), time.time() - t0)[1])(time.time())
        for _ in range(3)
    )
    assert best < COMPILE_BUDGET_SEC, (
        f"steady-state compile {best:.2f}s exceeds {COMPILE_BUDGET_SEC}s budget"
    )
