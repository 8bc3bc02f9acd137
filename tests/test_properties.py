"""Property-based tests (hypothesis): serializer round-trips and
DISTINCT over solutions with unbound variables (SURVEY hard part #6)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from database_spark.rio.reader import parse_nt_line
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"

# lexical space that survives one NT round-trip (escapes exercised)
lex_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),
    ),
    min_size=0,
    max_size=40,
)
iri_st = st.from_regex(r"urn:[A-Za-z0-9._-]{1,20}", fullmatch=True)
lang_st = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,8})?", fullmatch=True)


def n3(t: Term) -> str:
    from database_spark.rio.writers import _n3_py

    row = t.as_row()
    return _n3_py({"kind": row[0], "lex": row[1], "dt": row[2], "lang": row[3]})


@st.composite
def terms(draw):
    kind = draw(st.sampled_from(["iri", "lit", "lang", "typed"]))
    if kind == "iri":
        return Term.iri(draw(iri_st))
    lex = draw(lex_st)
    if kind == "lang":
        return Term.literal(lex, lang=draw(lang_st))
    if kind == "typed":
        return Term.literal(lex, dt="http://www.w3.org/2001/XMLSchema#integer")
    return Term.literal(lex)


@settings(max_examples=200, deadline=None)
@given(s=iri_st, p=iri_st, o=terms())
def test_nt_line_roundtrip(s, p, o):
    line = f"<{s}> <{p}> {n3(o)} ."
    parsed = parse_nt_line(line)
    assert parsed is not None, line
    ps, pp, po, _ = parsed
    assert ps.lex == s and pp.lex == p
    assert po.lex == o.lex and po.lang == o.lang
    if o.kind == o.__class__.iri("x").kind:  # IRI
        assert po.kind == o.kind


def test_distinct_with_unbound_rows(spark):
    """DISTINCT must treat unbound (null) the same in every row —
    mixed bound/unbound solutions from a UNION dedupe correctly."""
    trips = [
        (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("v")),
        (Term.iri(EX + "a"), Term.iri(EX + "q"), Term.literal("w")),
        (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal("v")),
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    res = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?s ?w WHERE {{
          {{ ?s ex:p "v" }} UNION {{ ?s ex:q ?w }}
        }}""")
    rows = sorted(
        (
            (r["s"]["lex"], r["w"]["lex"] if r["w"] is not None else None)
            for r in res.df.collect()
        ),
        key=lambda t: (t[0], t[1] is not None, t[1] or ""),
    )
    # a appears once with w unbound and once with w="w"; b once unbound
    assert rows == [
        (EX + "a", None),
        (EX + "a", "w"),
        (EX + "b", None),
    ]
    # and re-running DISTINCT over a doubled union stays identical
    res2 = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?s ?w WHERE {{
          {{ ?s ex:p "v" }} UNION {{ ?s ex:q ?w }}
          }}""")
    assert res2.df.count() == 3


def test_salted_join_balances_hub(spark):
    """skew_hub_join's mechanism (operators/skew.py): a key holding
    ~1/3 of all rows is spread across salt composite keys so the max
    reducer group shrinks ~salt-fold, while the join answer is
    IDENTICAL to the plain equi join (the salt never leaks)."""
    from pyspark.sql import functions as F

    from database_spark.operators.skew import key_histogram, salted_join

    big = spark.range(30000).select(
        F.when(F.col("id") % 3 == 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    small = spark.range(1, 200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("t")
    )
    # the profile shows the hub: top key holds ~1/3 of rows
    prof = key_histogram(big, "k", top=1).collect()[0]
    assert prof["k"] == 1 and prof["share"] > 0.3

    plain = big.join(small, "k").groupBy("t").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_join(big, small, "k", salt=8).groupBy("t").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # no single-task straggler: the hub's 10k rows split across 8
    # composite keys — max group ~1250, far below the unsalted 10k
    b = big.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    mx = (
        b.groupBy("k", "__salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert mx < 10000 / 8 * 1.7, mx
