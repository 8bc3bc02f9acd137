"""Benchmark decontamination: flag training documents that share a
word-shingle with an evaluation/benchmark set.

The standard training-pipeline hygiene step (GPT-3 appendix-C style
n-gram decontamination): any document containing a k-gram that also
appears in a held-out benchmark document is flagged so it can be
dropped or scrubbed before training.

Scale design (100 TB corpus, benchmark sets are small): the corpus
side streams — one projection to (doc_id, shingle) pairs, no shuffle of
document text — and the benchmark shingle set is BROADCAST, so the
whole operation is a map-side hash semi-join; nothing all-pairs, no
corpus shuffle.  For benchmark sets too large to broadcast, hash the
shingle to a long first (xxhash64) and let the join shuffle ids only.

Pure column expressions end to end (regexp_extract_all / transform /
slice / array_join) — no Python in the plan.  The tokenized word array
is materialized through a Generate barrier before the k-gram transform
references it: inlined, CollapseProject rewrites every lambda
reference into its own regexp_extract_all evaluation — measured 7x
slower on the shingle build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokenization shared with the oracle: lowercased [a-z0-9]+ runs
_TOKEN_RE = "[a-z0-9]+"


def _grams(words, k: int) -> Column:
    """Array of space-joined k-grams over an already-materialized word
    array; empty when there are fewer than ``k`` words."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - k),
        lambda i: F.array_join(F.slice(words, i + F.lit(1), k), " "),
    )
    return F.when(F.size(words) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Array of word k-grams of ``text`` as a single column expression.
    Convenient for ad-hoc use; inside a projection Catalyst may
    re-evaluate the tokenizer once per lambda reference — for bulk
    work prefer :func:`shingle_frame`, which materializes the word
    array through a Generate barrier first."""
    return _grams(F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0), k)


def shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, sh) — one row per word k-gram of each document.  The word
    array is produced by one Generate (explode of a 1-element array),
    so the tokenizer runs exactly once per document no matter how many
    times the k-gram transform references the array."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    base = df.select(F.col(id_col), F.explode(F.array(words)).alias("__w"))
    return base.select(
        F.col(id_col), F.explode(_grams(F.col("__w"), k)).alias("sh")
    )


def contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Documents of ``docs`` sharing at least one word ``k``-gram with
    any ``benchmark`` document: returns ``(id_col, n_bench)`` where
    ``n_bench`` counts the distinct benchmark documents hit.  The
    benchmark shingle set is broadcast (small side); the corpus side
    explodes to (id, shingle) and semi-joins map-side."""
    doc_sh = shingle_frame(docs, text_col, id_col, k)
    bench_sh = (
        shingle_frame(benchmark, text_col, id_col, k)
        .withColumnRenamed(id_col, "b_id")
        .dropDuplicates(["b_id", "sh"])
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct("b_id").alias("n_bench"))
    )
