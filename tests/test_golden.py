"""Data-driven golden query tests — the reference's primary test
strategy (AbstractDataDrivenSPARQLTestCase: query .rq + data + expected
results, compared as a multiset of solutions; SURVEY §5.1).

Fixtures live in tests/fixtures/golden/: one shared data file
(people.nt) + (qNN-*.rq, qNN-*.expected.json) pairs.  Expected files
hold lexical forms; "ordered": true asserts sequence, otherwise
multiset equality.
"""

import json
from pathlib import Path

import pytest

from database_spark.rio.reader import read_ntriples
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore

GOLDEN = Path(__file__).parent / "fixtures" / "golden"
CASES = sorted(p.stem for p in GOLDEN.glob("*.rq"))


@pytest.fixture(scope="module")
def engine(spark):
    df = read_ntriples(spark, str(GOLDEN / "people.nt"))
    store = TripleStore.from_term_structs(spark, df)
    return SparqlEngine(TripleStore(spark, store.df.localCheckpoint()))


@pytest.mark.parametrize("case", CASES)
def test_golden(engine, case):
    query = (GOLDEN / f"{case}.rq").read_text()
    expected = json.loads((GOLDEN / f"{case}.expected.json").read_text())
    res = engine.select(query)
    assert res.vars == expected["vars"], "projection mismatch"
    got = [
        tuple(r[v]["lex"] if r[v] is not None else None for v in res.vars)
        for r in res.df.collect()
    ]
    want = [tuple(row) for row in expected["rows"]]
    if expected.get("ordered"):
        assert got == want
    else:
        key = lambda t: tuple("" if x is None else x for x in t)  # noqa: E731
        assert sorted(got, key=key) == sorted(want, key=key)
