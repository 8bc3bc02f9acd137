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
