"""Deterministic sampling (pipeline/sample.py) + corpus vocab top-k."""

from pyspark.sql import functions as F

from database_spark.pipeline import sample
from database_spark.pipeline.text import vocab_topk


def test_sample_rate_deterministic_and_nested(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a1 = {r[0] for r in sample.sample_rate(d, "doc_id", 0.3).select("doc_id").collect()}
    a2 = {r[0] for r in sample.sample_rate(d, "doc_id", 0.3).select("doc_id").collect()}
    assert a1 == a2  # rerun-stable
    big = {r[0] for r in sample.sample_rate(d, "doc_id", 0.6).select("doc_id").collect()}
    assert a1 <= big  # raising the rate only ADDS documents
    n = d.count()
    assert 0.15 * n < len(a1) < 0.45 * n  # roughly the asked rate
    # different seed = different membership
    b = {r[0] for r in sample.sample_rate(d, "doc_id", 0.3, seed="s1").select("doc_id").collect()}
    assert b != a1


def test_sample_stratified_rates_and_no_shuffle(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sample.sample_stratified(
        d, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    totals = {r[0]: r[1] for r in d.groupBy("lang").count().collect()}
    assert got.get("en") == totals["en"]  # rate 1.0 keeps everything
    assert "de" not in got  # rate 0.0 drops the stratum
    for lang, n in totals.items():
        if lang in ("en", "de"):
            continue
        assert 0.2 * n < got.get(lang, 0) < 0.8 * n  # ~default rate
    # map-side only: the filter plan has no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_topk_order_and_tiebreak(spark):
    d = spark.createDataFrame(
        [("b b b a a c",), ("a c d",)], "text string"
    )
    rows = vocab_topk(d, "text", k=3).collect()
    assert [(r["token"], r["occurrences"]) for r in rows] == [
        ("a", 3),
        ("b", 3),
        ("c", 2),
    ]  # count desc, token asc on the a/b tie


def test_vocab_topk_doc_freq(spark):
    d = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c d")], "doc_id int, text string"
    )
    rows = vocab_topk(d, "text", k=4, id_col="doc_id").collect()
    got = {r["token"]: (r["occurrences"], r["doc_freq"]) for r in rows}
    assert got == {"a": (3, 2), "b": (3, 1), "c": (2, 2), "d": (1, 1)}


def test_sample_quota_exact_counts_and_determinism(spark):
    from database_spark.pipeline.sample import sample_quota

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else "b") for i in range(60)], "id long, src string"
    )
    out = sample_quota(df, "id", "src", {"a": 5}, default_quota=2, seed="t")
    rows = out.groupBy("src").count().collect()
    got = {r["src"]: r["count"] for r in rows}
    assert got == {"a": 5, "b": 2}
    # deterministic across invocations
    a1 = sorted(r["id"] for r in sample_quota(
        df, "id", "src", {"a": 5}, default_quota=2, seed="t").collect())
    a2 = sorted(r["id"] for r in sample_quota(
        df, "id", "src", {"a": 5}, default_quota=2, seed="t").collect())
    assert a1 == a2
    # quota above stratum size keeps the whole stratum; zero drops it
    full = sample_quota(df, "id", "src", {"a": 999}, default_quota=0, seed="t")
    assert full.count() == 40
    # growing the corpus only displaces at the boundary: the new
    # selection is still the hash-smallest quota per stratum
    bigger = df.unionByName(
        spark.createDataFrame([(i, "b") for i in range(100, 140)],
                              "id long, src string")
    )
    b1 = sample_quota(bigger, "id", "src", {}, default_quota=3, seed="t")
    assert b1.where("src = 'b'").count() == 3


def test_sample_quota_hot_stratum_bounded_and_exact(spark):
    """r11 verdict wrong #2: a stratum far bigger than its quota must
    NOT shuffle wholesale into one window task.  The two-stage top-k
    bounds the stage-2 window input to spread x quota per stratum, and
    membership is IDENTICAL to the one-window definition (the oracle
    contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from database_spark.pipeline.sample import (
        _quota_candidates,
        sample_quota,
    )

    # one hot stratum (5000 rows, quota 7) + a small one (50 rows, quota 5)
    df = spark.createDataFrame(
        [(i, "hot" if i < 5000 else "cold") for i in range(5050)],
        "id long, src string",
    )
    quotas = {"hot": 7, "cold": 5}
    spread = 16

    # stage-1 candidates are bounded: <= spread * quota per stratum
    order_key = F.md5(F.concat(F.lit("t"), F.col("id").cast("string")))
    quota = F.when(F.col("src") == "cold", 5).otherwise(
        F.when(F.col("src") == "hot", 7).otherwise(F.lit(0))
    )
    cand = _quota_candidates(df, "id", "src", order_key, quota, spread)
    per = {r["src"]: r["count"] for r in cand.groupBy("src").count().collect()}
    assert per["hot"] <= spread * 7
    assert per["hot"] < 5000  # the hot stratum was actually thinned
    assert per["cold"] <= 50

    # membership identical to the naive single-window definition
    got = sorted(
        (r["src"], r["id"])
        for r in sample_quota(
            df, "id", "src", quotas, seed="t", spread=spread
        ).collect()
    )
    w = Window.partitionBy("src").orderBy(order_key, F.col("id"))
    naive = (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )
    want = sorted((r["src"], r["id"]) for r in naive.collect())
    assert got == want
    assert len(got) == 12
