"""Document chunking: split texts into fixed-token windows with
overlap — the unit-of-work transform every training/embedding pipeline
runs between cleaning and tokenization (context-window packing, RAG
indexing, embedding batches).

Scale design: pure column expressions (regexp_extract_all /
posexplode / slice / array_join) — one Generate per document, no
shuffle, no Python; the word array is materialized through a Generate
barrier so the tokenizer runs once per document (see
``decontaminate.py`` — inlined lambda references re-evaluate it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import _TOKEN_RE


def chunk_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk, n_tok): sliding windows of
    ``chunk_tokens`` words advancing by ``chunk_tokens - overlap``.
    Every token lands in at least one chunk; the final chunk may be
    short; documents with no tokens produce no rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    base = df.select(F.col(id_col), F.explode(F.array(words)).alias("__w"))
    n = F.size("__w")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    piece = F.slice(F.col("__w"), F.col("s") + F.lit(1), chunk_tokens)
    return base.select(
        F.col(id_col),
        F.col("__w"),
        F.posexplode(starts).alias("chunk_idx", "s"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("long").alias("n_tok"),
    )
