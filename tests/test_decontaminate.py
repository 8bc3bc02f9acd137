"""Benchmark decontamination (pipeline/decontaminate.py): k-gram
overlap between a corpus and a broadcast benchmark set."""

import pytest

from database_spark.pipeline.decontaminate import contaminated, shingles


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # benchmark doc: the canary phrase lives here
        (0, "The quick brown fox jumps over the lazy dog tonight."),
        # contaminated: embeds the 5-gram "quick brown fox jumps over"
        (1, "intro text then quick brown fox jumps over and more text"),
        # clean: shares words but no 5-gram run
        (2, "the quick red fox sleeps under the lazy dog tonight"),
        # too short for any 5-gram
        (3, "four words only here"),
        # second benchmark doc, also hit by doc 4
        (10, "alpha beta gamma delta epsilon zeta"),
        (4, "prefix alpha beta gamma delta epsilon suffix"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_tokenization_and_short_docs(spark, docs):
    import pyspark.sql.functions as F

    got = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }
    assert "quick brown fox jumps over" in got[0]
    assert got[3] == []  # < 5 tokens -> no shingles, no sequence error
    # lowercase + punctuation-insensitive
    assert got[0][0] == "the quick brown fox jumps"


def test_contaminated_flags_and_counts(docs):
    import pyspark.sql.functions as F

    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    got = {
        r["doc_id"]: r["n_bench"]
        for r in contaminated(corpus, bench).collect()
    }
    assert got == {1: 1, 4: 1}


def test_contaminated_plan_is_broadcast_and_python_free(docs):
    import io
    import contextlib
    import pyspark.sql.functions as F

    bench = docs.where(F.col("doc_id") % 10 == 0)
    df = contaminated(docs, bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
