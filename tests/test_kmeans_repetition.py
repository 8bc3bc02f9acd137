"""pipeline/kmeans.py + text.repetition_stats unit semantics.

The sf-scale DuckDB oracle (`__spark_entry__`) checks these at corpus
scale; here we pin hand-computable cases and the determinism contract
(same data, different partitioning → identical output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_spark.pipeline.kmeans import kmeans_assign
from database_spark.pipeline.text import repetition_stats


def test_repetition_stats_hand_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),           # bigrams 3x"a a"; trigrams 2x"a a a"
            (2, "one"),               # too short for any n-gram
            (3, "w x y z"),           # all bigrams distinct
            (4, "p q p q p q"),       # alternating boilerplate
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, "text").collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["dup_trigram_frac"] == 0.5      # 2 trigrams, 1 distinct
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["dup_trigram_frac"] == 0.0
    # "p q p q p q": bigrams [pq,qp,pq,qp,pq] → top 3/5; trigrams
    # [pqp,qpq,pqp,qpq] → 2 distinct of 4
    assert got[4]["top_bigram_frac"] == pytest.approx(0.6, abs=1e-6)
    assert got[4]["dup_trigram_frac"] == pytest.approx(0.5, abs=1e-6)


def test_repetition_stats_is_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = (
        repetition_stats(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def _blobs(spark, n_per=20, sep=10.0):
    rows = []
    for i in range(n_per):
        rows.append((i, [0.0 + i * 0.01, 0.0, 1.0]))
        rows.append((100 + i, [sep + i * 0.01, sep, 1.0]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    got = {r["vec_id"]: r["cell"] for r in
           kmeans_assign(df, "vec_id", "embedding", k=2, iters=3).collect()}
    lo = {got[i] for i in range(20)}
    hi = {got[100 + i] for i in range(20)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    assert lo | hi == {0, 1}


def test_kmeans_deterministic_across_partitioning(spark):
    df = _blobs(spark)
    a = kmeans_assign(df, "vec_id", "embedding", k=3, iters=2)
    b = kmeans_assign(
        df.repartition(7, "vec_id"), "vec_id", "embedding", k=3, iters=2
    )
    ra = sorted((r["vec_id"], r["cell"]) for r in a.collect())
    rb = sorted((r["vec_id"], r["cell"]) for r in b.collect())
    assert ra == rb


def test_kmeans_fewer_rows_than_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    got = kmeans_assign(df, "vec_id", "embedding", k=8, iters=2).collect()
    assert {r["vec_id"] for r in got} == {1, 2}
    assert {r["cell"] for r in got} == {0, 1}


def test_duplicate_spans_hand_case(spark):
    from database_spark.pipeline.dedup import duplicate_spans

    shared = "q w e r t y u i o p"          # 10 shared tokens
    docs = spark.createDataFrame(
        [
            (1, f"a b c {shared} d e f"),    # shared at tokens 3..13
            (2, f"x y {shared} z"),          # shared at tokens 2..12
            (3, "m n o completely unique words here today folks ok"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, width=8).collect()
    }
    # width-8 windows inside the 10-token shared run: 3 per doc,
    # overlapping -> ONE merged span covering exactly the shared run
    assert got == {(1, 3, 13), (2, 2, 12)}


def test_duplicate_spans_merges_adjacent_and_within_doc(spark):
    from database_spark.pipeline.dedup import duplicate_spans

    run = "a1 a2 a3 a4 a5 a6 a7 a8"
    docs = spark.createDataFrame(
        # the same 8-gram twice INSIDE one document (back to back):
        # both occurrences are duplicated spans and merge into one
        [(7, f"s t {run} {run} u v")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, width=8).collect()
    }
    assert got == {(7, 2, 18)}


def test_corpus_funnel_monotone(spark, sf_dir):
    import __spark_entry__ as E

    rows = sorted(
        (r["stage"], r["n_docs"])
        for r in E.queries()["corpus_funnel"](spark, sf_dir).collect()
    )
    assert [s for s, _ in rows] == [0, 1, 2, 3, 4]
    ns = [n for _, n in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))  # cumulative filters
    assert ns[0] > 0


def test_kmeans_large_k_compiles_and_runs(spark):
    """k=64 over dim=32: the old literal-centroid expression tree was
    k*dim terms and would trip whole-stage codegen's 64 KB method
    limit; the data-driven matrix must compile to a constant-size plan
    and still assign every row."""
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(0, 10) for _ in range(32)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_assign(df, "vec_id", "embedding", k=64, iters=2).collect()
    assert len(got) == 400
    cells = {r["cell"] for r in got}
    assert cells and all(0 <= c < 64 for c in cells)
    assert len(cells) > 8  # genuinely using the larger codebook


def test_kmeans_empty_input_schema_follows_id_type(spark):
    df = spark.createDataFrame([], "doc_id string, embedding array<float>")
    out = kmeans_assign(df, "doc_id", "embedding", k=4, iters=1)
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "string"
