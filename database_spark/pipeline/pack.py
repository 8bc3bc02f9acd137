"""Sequence packing: assign documents to fixed-token-budget training
bins.

The transform every LLM training pipeline runs after chunking: group
documents into sequences of ~budget tokens so the trainer wastes no
context window.  This implements deterministic DOCUMENT-ORDER greedy
packing: within a shard, documents are taken in id order and a new bin
starts whenever the running token total crosses the budget.

Scale design: ONE shuffle (hash-partition by shard), then a per-shard
window cumulative sum — the sort is per shard, never global, and
shards are independent, so parallelism = ``shards`` (pick ≈ the
cluster's write parallelism at 100 TB; each bin lands in exactly one
shard's output file).  Pure column expressions: tokenization is the
shared ``pipeline.text`` contract, packing is a window sum + floor
division.  Deterministic, so a DuckDB window-function oracle produces
identical bins.

Approximation note (same as standard greedy packers): a document
longer than the budget still occupies its natural position — its bin
simply overflows — and the last bin of a shard may be short.  Exact
bin-packing is NP-hard and order-dependent; document-order greedy is
the reproducible choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_greedy(
    docs: DataFrame,
    budget: int = 512,
    shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bin assignment: (doc_id, shard, bin, n_tok).

    ``bin = floor((cumsum(n_tok) - n_tok) / budget)`` over the shard's
    id-ordered prefix sums — a document starts a new bin exactly when
    the tokens before it fill the previous one."""
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col).cast("long") % shards).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tok").over(w)
    return t.select(
        "doc_id",
        "shard",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / budget).cast("long").alias("bin"),
    )


def pack_summary(
    docs: DataFrame, budget: int = 512, shards: int = 16
) -> DataFrame:
    """Per-bin rollup (shard, bin, n_docs, n_tokens) — the packing
    manifest a trainer's data loader reads."""
    return (
        pack_greedy(docs, budget=budget, shards=shards)
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
