"""General custom-datatype registration (IExtension analog).

Reference: ``IExtension.java`` — custom datatype literals inlined into
a native value space; e.g. ``EpochExtension`` maps a custom dateTime
datatype onto epoch longs so range filters, ordering and aggregates
evaluate numerically without a dictionary join.
"""

import pytest

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"
EPOCH_DT = EX + "epochMillis"


@pytest.fixture(scope="module")
def engine(spark):
    T.register_datatype(EPOCH_DT, "integer")
    at = Term.iri(EX + "at")
    trips = [
        (Term.iri(EX + "e1"), at, Term.literal("1000", EPOCH_DT)),
        (Term.iri(EX + "e2"), at, Term.literal("250", EPOCH_DT)),
        (Term.iri(EX + "e3"), at, Term.literal("99", EPOCH_DT)),
    ]
    yield SparqlEngine(TripleStore.from_python_triples(spark, trips))
    T.unregister_datatype(EPOCH_DT)


def test_range_filter_in_value_space(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?s WHERE {{ ?s ex:at ?t . FILTER(?t > 100) }}""")
    got = sorted(r["s"]["lex"] for r in res.df.collect())
    # lexical compare would keep "99" (> "100"); value compare must not
    assert got == [EX + "e1", EX + "e2"]


def test_order_by_numeric_not_lexical(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?t WHERE {{ ?s ex:at ?t }} ORDER BY ?t""")
    assert [r["t"]["lex"] for r in res.df.collect()] == ["99", "250", "1000"]


def test_numeric_aggregate(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT (SUM(?t) AS ?total) WHERE {{ ?s ex:at ?t }}""")
    assert res.df.collect()[0]["total"]["lex"] == "1349"


def test_registration_validation():
    with pytest.raises(ValueError):
        T.register_datatype(EX + "bad", "complex")
    with pytest.raises(ValueError):
        T.unregister_datatype(T.XSD_INTEGER)
