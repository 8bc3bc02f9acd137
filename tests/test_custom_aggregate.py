"""Custom aggregate registration (IAggregate analog —
CORE/bop/aggregate/IAggregate.java): register an IRI-named aggregate,
use it in GROUP BY queries like a builtin."""

import pytest
from pyspark.sql import functions as F

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.sparql.functions import (
    pack_numeric,
    register_aggregate,
    unregister_aggregate,
)
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"
MEDIAN = EX + "fn/median"


def iri(x):
    return Term.iri(EX + x)


@pytest.fixture(scope="module")
def engine(spark):
    score = iri("score")
    grp = iri("group")
    trips = []
    for i, (g, v) in enumerate(
        [("a", 1), ("a", 3), ("a", 100), ("b", 10), ("b", 20), ("b", 30), ("b", 40)]
    ):
        s = iri(f"item{i}")
        trips.append((s, grp, iri(g)))
        trips.append((s, score, Term.integer(v)))
    store = TripleStore.from_python_triples(spark, trips)
    store = TripleStore(spark, store.df.localCheckpoint())
    return SparqlEngine(store)


@pytest.fixture(scope="module", autouse=True)
def median_agg():
    def median(in_t, distinct):
        v = T.numeric_value(in_t)
        return pack_numeric(F.median(v), F.lit(T.XSD_DOUBLE))

    register_aggregate(MEDIAN, median)
    yield
    unregister_aggregate(MEDIAN)


def test_custom_aggregate_group_by(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX fn: <{EX}fn/>
        SELECT ?g (fn:median(?v) AS ?m)
        WHERE {{ ?s ex:group ?g . ?s ex:score ?v }}
        GROUP BY ?g ORDER BY ?g""")
    rows = [(r["g"]["lex"], float(r["m"]["lex"])) for r in res.df.collect()]
    assert rows == [(EX + "a", 3.0), (EX + "b", 25.0)]


def test_custom_aggregate_beside_builtin(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX fn: <{EX}fn/>
        SELECT ?g (fn:median(?v) AS ?m) (COUNT(?v) AS ?n)
        WHERE {{ ?s ex:group ?g . ?s ex:score ?v }}
        GROUP BY ?g ORDER BY ?g""")
    rows = [
        (r["g"]["lex"], float(r["m"]["lex"]), int(r["n"]["lex"]))
        for r in res.df.collect()
    ]
    assert rows == [(EX + "a", 3.0, 3), (EX + "b", 25.0, 4)]


def test_unregistered_iri_is_plain_function_error(engine):
    from database_spark.sparql.compiler import SparqlCompileError

    with pytest.raises(Exception):
        engine.select(f"""
            PREFIX ex: <{EX}>
            SELECT (ex:nope(?v) AS ?m)
            WHERE {{ ?s ex:score ?v }} GROUP BY ?s""").df.collect()
