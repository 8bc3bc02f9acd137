"""Arbitrary-length property paths under GRAPH ?var — the fixpoint
must run per graph partition (closure keyed on (g, a, b)); reference
``ArbitraryLengthPathOp.java:48`` evaluates inside any graph scope."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def iri(x):
    return Term.iri(EX + x)


@pytest.fixture(scope="module")
def engine(spark):
    nxt = iri("next")
    g1, g2 = iri("g1"), iri("g2")
    # g1: a -> b -> c (chain); g2: a -> d (single hop, same start node)
    trips = [
        (iri("a"), nxt, iri("b"), g1),
        (iri("b"), nxt, iri("c"), g1),
        (iri("a"), nxt, iri("d"), g2),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    return SparqlEngine(store)


def rows(res, *vs):
    out = set()
    for r in res.df.collect():
        out.add(tuple(r[v]["lex"].removeprefix(EX) if r[v] else None for v in vs))
    return out


def test_plus_under_graph_var(engine):
    res = engine.select(
        f"PREFIX ex: <{EX}> SELECT ?g ?x ?y WHERE {{ GRAPH ?g {{ ?x ex:next+ ?y }} }}"
    )
    assert rows(res, "g", "x", "y") == {
        ("g1", "a", "b"), ("g1", "b", "c"), ("g1", "a", "c"),
        ("g2", "a", "d"),
    }


def test_plus_under_graph_var_seeded(engine):
    res = engine.select(
        f"PREFIX ex: <{EX}> SELECT ?g ?y WHERE {{ GRAPH ?g {{ ex:a ex:next+ ?y }} }}"
    )
    assert rows(res, "g", "y") == {("g1", "b"), ("g1", "c"), ("g2", "d")}


def test_star_under_graph_var_seeded(engine):
    # zero-length match of the constant exists per graph it occurs in
    res = engine.select(
        f"PREFIX ex: <{EX}> SELECT ?g ?y WHERE {{ GRAPH ?g {{ ex:a ex:next* ?y }} }}"
    )
    assert rows(res, "g", "y") == {
        ("g1", "a"), ("g1", "b"), ("g1", "c"),
        ("g2", "a"), ("g2", "d"),
    }


def test_plus_named_graph_const_still_works(engine):
    res = engine.select(
        f"PREFIX ex: <{EX}> SELECT ?y WHERE {{ GRAPH ex:g1 {{ ex:a ex:next+ ?y }} }}"
    )
    assert rows(res, "y") == {("b",), ("c",)}


@pytest.fixture(scope="module")
def family_engine(spark):
    """ticket_bg2066 data: John fatherOf {LittleJohn, LittleJona};
    LittleJona knows Pete (triples, default graph)."""
    fo, kn = iri("fatherOf"), iri("knows")
    trips = [
        (iri("John"), fo, iri("LittleJohn"), None),
        (iri("John"), fo, iri("LittleJona"), None),
        (iri("LittleJona"), kn, iri("Pete"), None),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    return SparqlEngine(store)


def test_correlated_zero_length_path_in_minus(family_engine):
    """ticket_bg2066: a MINUS inner `?o knows* []` evaluates as-bound —
    ANY outer-bound ?o matches at length zero, so every outer row is
    removed (the zero-length domain is not limited to knows-incident
    nodes)."""
    res = family_engine.select(
        f"""
        SELECT * WHERE {{
          ?s <{EX}fatherOf>* ?o .
          MINUS {{ ?o <{EX}knows>* [] . }}
          FILTER(?o != <{EX}LittleJohn>)
        }}
        """
    )
    assert rows(res, "s", "o") == set()


def test_uncorrelated_star_zero_domain_stays_narrow(family_engine):
    """Uncorrelated free-free `knows*` keeps the step-relation node
    domain (property-paths-6 reference behavior): zero-length pairs
    only for knows-incident nodes."""
    res = family_engine.select(
        f"SELECT ?a ?b WHERE {{ ?a <{EX}knows>* ?b . }}"
    )
    assert rows(res, "a", "b") == {
        ("LittleJona", "Pete"),
        ("LittleJona", "LittleJona"),
        ("Pete", "Pete"),
    }
