"""Query-time backchained entailments (reference:
``BackchainAccessPath.java`` — entailments answered at query time from
the schema hierarchy instead of a materialized closure).

Scope: bound-position expansion — a bound CLASS in an rdf:type pattern
expands through the subclass closure (rdfs9/11), a bound PREDICATE
through the subproperty closure (rdfs7), with owl:equivalentClass/
Property folded in.  Unbound-position entailment still needs the
materialized closure (`inference.rdfs_closure` /
``maintain_entailments``).
"""

import pytest

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def iri(x):
    return Term.iri(EX + x)


@pytest.fixture(scope="module")
def engines(spark):
    rdf_type = Term.iri(T.RDF + "type")
    subc = Term.iri(T.RDFS + "subClassOf")
    subp = Term.iri(T.RDFS + "subPropertyOf")
    eqc = Term.iri(T.OWL + "equivalentClass")
    trips = [
        # schema: Student < Person; GradStudent < Student; Human = Person
        (iri("Student"), subc, iri("Person")),
        (iri("GradStudent"), subc, iri("Student")),
        (iri("Human"), eqc, iri("Person")),
        (iri("mentors"), subp, iri("knows")),
        # instances typed ONLY with the most specific class
        (iri("alice"), rdf_type, iri("GradStudent")),
        (iri("bob"), rdf_type, iri("Student")),
        (iri("carol"), rdf_type, iri("Person")),
        (iri("dan"), rdf_type, iri("Human")),
        (iri("alice"), iri("mentors"), iri("bob")),
        (iri("bob"), iri("knows"), iri("carol")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    return (
        SparqlEngine(store, backchain=True),
        SparqlEngine(store),  # no backchain: explicit statements only
    )


def _subjects(engine, q):
    return sorted(r["x"]["lex"].rsplit("/", 1)[-1]
                  for r in engine.select(q).df.collect())


def test_bound_class_backchain(engines):
    bc, plain = engines
    q = f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x a ex:Person }}"
    assert _subjects(bc, q) == ["alice", "bob", "carol", "dan"]
    assert _subjects(plain, q) == ["carol"]
    q2 = f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x a ex:Student }}"
    assert _subjects(bc, q2) == ["alice", "bob"]


def test_bound_predicate_backchain(engines):
    bc, plain = engines
    q = f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x ex:knows ?y }}"
    assert _subjects(bc, q) == ["alice", "bob"]
    assert _subjects(plain, q) == ["bob"]


def test_equivalent_class_both_directions(engines):
    bc, _ = engines
    q = f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x a ex:Human }}"
    # Human = Person: everything Person-entailed is Human-entailed
    assert _subjects(bc, q) == ["alice", "bob", "carol", "dan"]


def test_most_specific_class_unexpanded(engines):
    bc, _ = engines
    q = f"PREFIX ex: <{EX}> SELECT ?x WHERE {{ ?x a ex:GradStudent }}"
    assert _subjects(bc, q) == ["alice"]
