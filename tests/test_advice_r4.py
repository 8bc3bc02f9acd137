"""Regression tests for round-4 advisor findings (ADVICE.md r4) and
the round-4 verdict's headline scale fix:

* Turtle/N-Triples literal escaping of \\r and \\t (STRING_LITERAL_QUOTE
  forbids raw control chars; reference: Sesame TurtleUtil.encodeString)
* _ttl_iri picks the TIGHTEST (longest) namespace for nested prefixes
* DESCRIBE plan cache is LRU-bounded (DescribeCache is a managed index)
* POST /namespace: 400 for a malformed name, 409 only for duplicates
* maybe-unbound shared-var rejoin compiles to a union of equi-join
  branches (hash-joinable) instead of an isNull|isNull|eq non-equi
  condition that degrades to BroadcastNestedLoopJoin at scale
  (reference: JVMHashJoinUtility hashes on the bound subset)
"""

import io
import contextlib
import urllib.error
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from database_spark import terms as T
from database_spark.rio import writers as W
from database_spark.rio.reader import parse_nt_line
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "urn:ex:"


# ------------------------------------------------ writer escaping (medium)
def test_nt_and_turtle_escape_cr_and_tab(spark):
    nasty = "line1\r\nline2\twith tab"
    df = spark.range(1).select(
        T.iri_col(F.lit(EX + "s")).alias("st"),
        T.lit_term(Term.iri(EX + "p")).alias("pt"),
        T.term_struct(
            F.lit(T.KIND_LITERAL), F.lit(nasty), F.lit(T.XSD_STRING), F.lit(None)
        ).alias("ot"),
    )
    line = W.ntriples_lines(df).collect()[0]["value"]
    assert "\r" not in line and "\t" not in line  # no raw control chars
    assert "\\r" in line and "\\t" in line
    _s, _p, o, _g = parse_nt_line(line)
    assert o.lex == nasty  # round-trips exactly
    ttl = df.select(W.ttl_term(F.col("ot"), {}).alias("t")).collect()[0]["t"]
    assert "\r" not in ttl and "\t" not in ttl
    assert "\\r" in ttl and "\\t" in ttl


# ------------------------------------------- nested prefix precedence (low)
def test_ttl_iri_prefers_tightest_namespace(spark):
    pfx = {"ex": "http://e.org/", "exsub": "http://e.org/sub/"}
    got = (
        spark.range(1)
        .select(W._ttl_iri(F.lit("http://e.org/sub/thing"), pfx).alias("x"))
        .collect()[0]["x"]
    )
    assert got == "exsub:thing"
    got2 = (
        spark.range(1)
        .select(W._ttl_iri(F.lit("http://e.org/top"), pfx).alias("x"))
        .collect()[0]["x"]
    )
    assert got2 == "ex:top"


# ------------------------------------------------- describe LRU bound (low)
def test_describe_cache_is_lru_bounded(spark):
    e = SparqlEngine(
        TripleStore.from_python_triples(
            spark,
            [(Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("x"))],
        )
    )
    for i in range(e._describe_cache_max + 20):
        e.describe(f"DESCRIBE <{EX}r{i}>")
    assert len(e._describe_cache) == e._describe_cache_max
    # most-recent entry still hits
    d1 = e.describe(f"DESCRIBE <{EX}r0x>")
    d2 = e.describe(f"DESCRIBE <{EX}r0x>")
    assert d1 is d2


# -------------------------------------------- namespace status codes (low)
def _post_ns(port: int, name: str) -> int:
    data = urllib.parse.urlencode({"name": name}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/namespace", data=data)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status
    except urllib.error.HTTPError as ex:
        return ex.code


def test_namespace_create_400_vs_409(spark):
    from database_spark.server import SparqlEndpoint

    e = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(e, host="127.0.0.1", port=0)
    ep.start()
    try:
        port = ep._server.server_address[1]
        assert _post_ns(port, "fresh_ns") == 201
        assert _post_ns(port, "fresh_ns") == 409  # duplicate → conflict
        assert _post_ns(port, "bad name!") == 400  # malformed → client error
    finally:
        ep.stop()


# ------------------------------- maybe-unbound rejoin decomposition (verdict)
@pytest.fixture(scope="module")
def rejoin_engine(spark):
    trips = [
        (Term.iri(EX + "n1"), Term.iri(EX + "type"), Term.iri(EX + "N")),
        (Term.iri(EX + "n2"), Term.iri(EX + "type"), Term.iri(EX + "N")),
        (Term.iri(EX + "c1"), Term.iri(EX + "nat"), Term.iri(EX + "n1")),
        (Term.iri(EX + "c1"), Term.iri(EX + "bal"), Term.literal("5", dt=T.XSD_INTEGER)),
        (Term.iri(EX + "o1"), Term.iri(EX + "cust"), Term.iri(EX + "c1")),
        (Term.iri(EX + "o2"), Term.iri(EX + "cust"), Term.iri(EX + "c1")),
        (Term.iri(EX + "o3"), Term.iri(EX + "cust"), Term.iri(EX + "c9")),
    ]
    return SparqlEngine(TripleStore.from_python_triples(spark, trips))


REJOIN_Q = f"""
SELECT ?n ?o WHERE {{
  ?n <{EX}type> <{EX}N> .
  OPTIONAL {{ ?c <{EX}nat> ?n ; <{EX}bal> ?bal . FILTER(?bal > 3) }}
  ?o <{EX}cust> ?c .
}}"""


def test_nullable_rejoin_semantics(rejoin_engine):
    res = rejoin_engine.select(REJOIN_Q)
    rows = sorted((r["n"]["lex"], r["o"]["lex"]) for r in res.df.collect())
    # n1's OPTIONAL binds c1 (bal 5 > 3) → orders o1,o2; n2 leaves ?c
    # unbound → compatible with EVERY order (o1,o2,o3)
    assert rows == sorted(
        [
            (EX + "n1", EX + "o1"),
            (EX + "n1", EX + "o2"),
            (EX + "n2", EX + "o1"),
            (EX + "n2", EX + "o2"),
            (EX + "n2", EX + "o3"),
        ]
    )


def test_nullable_rejoin_is_hash_joinable(rejoin_engine):
    res = rejoin_engine.select(REJOIN_Q)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.df.explain("formatted")
    plan = buf.getvalue()
    # the bound x bound branch must be an equi (hash) join and the
    # branches must union; BNLJ may only appear for the tiny null-side
    # cross branches, never as the sole join strategy
    assert "Union" in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_union_nullable_rejoin_semantics(spark):
    # UNION is the other producer of maybe-unbound vars: the left arm
    # binds ?v, the right arm does not; the follow-up pattern re-joins ?v
    trips = [
        (Term.iri(EX + "a1"), Term.iri(EX + "tag"), Term.iri(EX + "v1")),
        (Term.iri(EX + "a2"), Term.iri(EX + "other"), Term.literal("x")),
        (Term.iri(EX + "v1"), Term.iri(EX + "score"), Term.literal("7", dt=T.XSD_INTEGER)),
        (Term.iri(EX + "v2"), Term.iri(EX + "score"), Term.literal("9", dt=T.XSD_INTEGER)),
    ]
    e = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    res = e.select(
        f"""
        SELECT ?s ?v ?sc WHERE {{
          {{ ?s <{EX}tag> ?v }} UNION {{ ?s <{EX}other> ?x }}
          ?v <{EX}score> ?sc .
        }}"""
    )
    rows = sorted(
        (r["s"]["lex"], r["v"]["lex"], r["sc"]["lex"]) for r in res.df.collect()
    )
    # a1 binds v=v1 → score 7; a2 leaves ?v unbound → matches v1 and v2
    assert rows == sorted(
        [
            (EX + "a1", EX + "v1", "7"),
            (EX + "a2", EX + "v1", "7"),
            (EX + "a2", EX + "v2", "9"),
        ]
    )


def test_describe_cache_materializes_and_invalidates(spark):
    e = SparqlEngine(
        TripleStore.from_python_triples(
            spark,
            [(Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("x"))],
        )
    )
    d = e.describe(f"DESCRIBE <{EX}a>")
    assert d.storageLevel.useMemory or d.storageLevel.useDisk  # materialized cache
    assert e.describe(f"DESCRIBE <{EX}a>") is d
    e.update(f'INSERT DATA {{ <{EX}b> <{EX}p> "y" }}')
    assert len(e._describe_cache) == 0  # mutation invalidated
    d2 = e.describe(f"DESCRIBE <{EX}a>")
    assert d2 is not d


def test_stacked_optional_rejoin_left_outer_decomposition(spark):
    """A second OPTIONAL re-joining a var the first OPTIONAL left
    nullable: the left_outer branch decomposition (left-side split)
    must preserve exact LeftJoin semantics."""
    trips = [
        (Term.iri(EX + "n1"), Term.iri(EX + "type"), Term.iri(EX + "N")),
        (Term.iri(EX + "n2"), Term.iri(EX + "type"), Term.iri(EX + "N")),
        (Term.iri(EX + "c1"), Term.iri(EX + "nat"), Term.iri(EX + "n1")),
        (Term.iri(EX + "c1"), Term.iri(EX + "mail"), Term.literal("c1@x")),
        (Term.iri(EX + "c2"), Term.iri(EX + "mail"), Term.literal("c2@x")),
    ]
    e = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    res = e.select(f"""
        SELECT ?n ?c ?m WHERE {{
          ?n <{EX}type> <{EX}N> .
          OPTIONAL {{ ?c <{EX}nat> ?n }}
          OPTIONAL {{ ?c <{EX}mail> ?m }}
        }}""")
    rows = sorted(
        (
            r["n"]["lex"],
            r["c"]["lex"] if r["c"] else None,
            r["m"]["lex"] if r["m"] else None,
        )
        for r in res.df.collect()
    )
    # n1: c bound to c1, mail joins → c1@x.
    # n2: c unbound; second OPTIONAL's pattern matches ANY (c, m):
    # compatible extensions bind (c1, c1@x) and (c2, c2@x).
    assert rows == sorted(
        [
            (EX + "n1", EX + "c1", "c1@x"),
            (EX + "n2", EX + "c1", "c1@x"),
            (EX + "n2", EX + "c2", "c2@x"),
        ]
    )
