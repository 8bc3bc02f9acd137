"""Document chunking (pipeline/chunk.py): fixed-token windows with
overlap, pure column expressions."""

import pytest

from database_spark.pipeline.chunk import chunk_frame


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (2, "solo"),                                 # 1 token
        (3, "...!!!"),                               # 0 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(docs):
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk"], r["n_tok"])
        for r in chunk_frame(docs, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3: starts 0,3,6,9 for the 10-token doc
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(1, 3)] == ("w9", 1)  # short tail
    assert got[(2, 0)] == ("solo", 1)
    assert not [k for k in got if k[0] == 3]  # empty doc -> no rows


def test_chunk_covers_every_token(docs):
    import pyspark.sql.functions as F

    out = chunk_frame(docs, chunk_tokens=4, overlap=2)
    toks = (
        out.select(F.explode(F.split("chunk", " ")).alias("t"))
        .where(F.col("t") != "")
        .dropDuplicates()
        .count()
    )
    assert toks == 11  # w0..w9 + solo


def test_chunk_validates_overlap(docs):
    with pytest.raises(ValueError):
        chunk_frame(docs, chunk_tokens=4, overlap=4)


def test_chunk_plan_python_free(docs):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_frame(docs).explain("formatted")
    assert "EvalPython" not in buf.getvalue()
