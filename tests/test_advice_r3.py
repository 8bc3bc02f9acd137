"""Regression tests for round-3 advisor findings (ADVICE.md r3):
bigint VALUES literals without the DOUBLE round-trip, GET-update
rejection, CEIL/FLOOR datatype families, backchain memo invalidation,
driver-local BFS/SSSP honouring max_iter."""

import urllib.error
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from database_spark.operators.graph import _values_df, bfs, connected_components, sssp
from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


# ------------------------------------------------- bigint VALUES (high)
def test_values_df_bigint_exact_above_2_53(spark):
    # xxhash64 node ids exceed 2^53; a DOUBLE literal round-trip would
    # drop low bits and corrupt component labels (ADVICE r3 #1)
    big = (1 << 60) + 12345  # not representable in float64
    rows = [(1, big), (2, big + 1)]
    got = {
        r["node"]: r["component"]
        for r in _values_df(spark, rows, "node", "component", val_type="bigint").collect()
    }
    assert got == {1: big, 2: big + 1}


def test_cc_small_path_preserves_64bit_labels(spark):
    a = -(1 << 60) + 7
    b = (1 << 59) + 99991
    c = (1 << 59) + 99992
    edges = spark.sql(
        f"SELECT * FROM VALUES (CAST({a} AS BIGINT), CAST({b} AS BIGINT)),"
        f"(CAST({b} AS BIGINT), CAST({c} AS BIGINT)) AS t(src, dst)"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {a: a, b: a, c: a}


# ------------------------------------------------- GET update (medium)
def test_get_update_rejected_post_allowed(spark):
    name = Term.iri(EX + "name")
    eng = SparqlEngine(
        TripleStore.from_python_triples(
            spark, [(Term.iri(EX + "a"), name, Term.literal("Alice"))]
        )
    )
    ep = SparqlEndpoint(eng).start()
    try:
        upd = f'PREFIX ex: <{EX}> INSERT DATA {{ ex:b ex:name "Bob" }}'
        url = ep.url + "?" + urllib.parse.urlencode({"update": upd})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url)
        assert ei.value.code == 405
        # state unchanged by the rejected GET
        assert not eng.ask(f'PREFIX ex: <{EX}> ASK {{ ex:b ex:name "Bob" }}')
        # POST still works
        req = urllib.request.Request(
            ep.url,
            data=urllib.parse.urlencode({"update": upd}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        assert eng.ask(f'PREFIX ex: <{EX}> ASK {{ ex:b ex:name "Bob" }}')
    finally:
        ep.stop()


# ------------------------------------------- CEIL/FLOOR families (medium)
@pytest.fixture(scope="module")
def fn_engine(spark):
    v = Term.iri(EX + "v")
    trips = [(Term.iri(EX + "x"), v, Term.literal("1"))]
    return SparqlEngine(TripleStore.from_python_triples(spark, trips))


def _one(engine, expr):
    res = engine.select(f"SELECT ({expr} AS ?r) WHERE {{ }}")
    [row] = res.df.collect()
    t = row["r"]
    return (t["lex"], t["dt"]) if t is not None else None


def test_ceil_floor_integer_passthrough(fn_engine):
    XSD = "http://www.w3.org/2001/XMLSchema#"
    # integer-family operands pass through unchanged (NumericBOp.get)
    assert _one(fn_engine, "CEIL(2)") == ("2", XSD + "integer")
    assert _one(fn_engine, "FLOOR(2)") == ("2", XSD + "integer")
    assert _one(fn_engine, "ROUND(7)") == ("7", XSD + "integer")
    # decimal stays decimal
    lex, dt = _one(fn_engine, "CEIL(1.5)")
    assert dt == XSD + "decimal" and float(lex) == 2.0
    # double input → double out (MathUtility: Math.ceil → double)
    lex, dt = _one(fn_engine, "CEIL(1.5e0)")
    assert dt == XSD + "double" and float(lex) == 2.0
    lex, dt = _one(fn_engine, 'FLOOR("2.7"^^<http://www.w3.org/2001/XMLSchema#float>)')
    assert dt == XSD + "double" and float(lex) == 2.0


# ------------------------------------- backchain memo invalidation (low)
def test_backchain_maps_invalidated_by_update(spark):
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    trips = [
        (Term.iri(EX + "dog"), Term.iri(RDFS + "subClassOf"), Term.iri(EX + "animal")),
        (Term.iri(EX + "rex"), Term.iri(RDF + "type"), Term.iri(EX + "dog")),
    ]
    eng = SparqlEngine(
        TripleStore.from_python_triples(spark, trips), backchain=True
    )
    q = (
        f"PREFIX ex: <{EX}> PREFIX rdf: <{RDF}> "
        "SELECT ?s WHERE { ?s rdf:type ex:lifeform }"
    )
    assert eng.select(q).df.count() == 0  # memoizes the closure
    eng.update(
        f"PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}> "
        "INSERT DATA { ex:animal rdfs:subClassOf ex:lifeform }"
    )
    assert eng.select(q).df.count() == 1  # stale memo would return 0


# --------------------------------------- driver-local max_iter (low)
def test_probe_small_bfs_sssp_respect_max_iter_guard(spark):
    # max_iter is a no-fixpoint safety valve that RAISES (iterate.py);
    # the driver-local path previously bypassed it on probe-small
    # graphs and returned the full (beyond-guard) closure
    edges = spark.sql(
        "SELECT * FROM VALUES (1,2,1.0),(2,3,1.0),(3,4,1.0) AS t(src, dst, weight)"
    ).select(F.col("src").cast("long"), F.col("dst").cast("long"), "weight")
    seeds = spark.sql("SELECT CAST(1 AS BIGINT) AS node")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        bfs(edges.select("src", "dst"), seeds, max_iter=2)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        sssp(edges, seeds, max_iter=2)
    # a sufficient cap converges and matches the uncapped local result
    got = {r["node"]: r["depth"] for r in bfs(edges, seeds, max_iter=8).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
