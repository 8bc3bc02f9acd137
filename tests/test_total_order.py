"""Mixed-type SPARQL total order — MIN/MAX/ORDER BY over terms of
different classes must match the reference comparator
(``IVComparator.java:68`` → Sesame ValueComparator): bnodes < IRIs <
plain/lang literals < numerics (by value) < calendar < other datatypes
by datatype IRI.  Regression for TCK aggregate-max2/min2 (fixture
``aggregate-min-max.ttl``)."""

import pytest

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example/"


@pytest.fixture(scope="module")
def engine(spark):
    # mirror of the reference's aggregate-min-max.ttl
    p, q, r = Term.iri(EX + "p"), Term.iri(EX + "q"), Term.iri(EX + "r")
    x1 = Term.iri(EX + "x1")
    trips = [
        (x1, p, Term.decimal("1.5")),
        (x1, p, Term.integer(3)),
        (x1, p, Term.iri(EX + "x2")),
        (x1, q, Term.literal("bigdata", lang="en")),
        (x1, q, Term.literal("bigdata", lang="de")),
        (x1, r, Term.iri("http://www.bigdata.com/blog/")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    store = TripleStore(spark, store.df.localCheckpoint(), has_named=False)
    return SparqlEngine(store)


def test_aggregate_max2_numeric_tops_lang_strings(engine):
    res = engine.select("SELECT (MAX(?o) AS ?m) WHERE { ?s ?p ?o }")
    [row] = res.df.collect()
    assert row["m"]["lex"] == "3"
    assert row["m"]["dt"] == T.XSD_INTEGER


def test_aggregate_min2_iri_below_literals(engine):
    res = engine.select("SELECT (MIN(?o) AS ?m) WHERE { ?s ?p ?o }")
    [row] = res.df.collect()
    assert row["m"]["kind"] == T.KIND_IRI
    assert row["m"]["lex"] == EX + "x2"


def test_order_by_mixed_classes(engine):
    res = engine.select("SELECT ?o WHERE { ?s ?p ?o } ORDER BY ?o")
    got = [r["o"]["lex"] for r in res.df.collect()]
    assert got == [
        EX + "x2",                      # IRIs first (lex order)
        "http://www.bigdata.com/blog/",
        "bigdata",                      # lang class: de < en
        "bigdata",
        "1.5",                          # numerics by value above strings
        "3",
    ]
    langs = [r["o"]["lang"] for r in res.df.collect()]
    assert langs[2:4] == ["de", "en"]


def test_order_lang_before_typed_other(spark):
    # other-datatype class sits above calendar and numerics; within it,
    # order by datatype IRI then lex (ValueComparator.compareDatatypes)
    p = Term.iri(EX + "p")
    s = Term.iri(EX + "s")
    trips = [
        (s, p, Term.boolean(True)),
        (s, p, Term.boolean(False)),
        (s, p, Term.literal("2001-01-01", dt=T.XSD_DATE)),
        (s, p, Term.integer(99)),
        (s, p, Term.literal("zzz")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    eng = SparqlEngine(TripleStore(spark, store.df.localCheckpoint(), has_named=False))
    res = eng.select("SELECT ?o WHERE { ?s ?p ?o } ORDER BY ?o")
    got = [r["o"]["lex"] for r in res.df.collect()]
    assert got == ["zzz", "99", "2001-01-01", "false", "true"]
