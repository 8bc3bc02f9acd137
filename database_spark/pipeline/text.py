"""Text analysis operators for large-scale training-data pipelines.

These extend the engine beyond the reference's surface (the reference's
nearest feature is the full-text index, ``BigdataValueCentricFullTextIndex``);
they are first-class operators designed for 100 TB corpora: every
function is a pure Column expression (JVM codegen, no Python in the hot
path) and every regex is RE2-safe so a DuckDB oracle can run the same
logic.

Tokenization contract (shared with the DuckDB oracles in
``__spark_entry__``): tokens = ``regexp_extract_all(lower(text),
'[a-z0-9]+')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# small per-language stopword marker sets (n-gram heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "del", "por"],
    "it": ["il", "di", "che", "per", "con", "del", "sono", "una"],
}


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    """Whitespace/alnum token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximate token count: GPT-style pieces ≈ words + punct +
    long-word splits (a cheap, deterministic proxy: ceil(chars/4) and
    word count averaged — tracks real BPE within ~10% on English)."""
    words = F.size(tokens(text))
    chars = F.length(text)
    return F.ceil((words + F.ceil(chars / 4.0)) / 2.0).cast("long")


def _marker_hits(text: Column, words: list[str]) -> Column:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_id(text: Column) -> Column:
    """Heuristic language ID over stopword families; 'und' if no hits.

    Deterministic argmax with fixed tie order (en>de>fr>es>it).
    """
    # argmax via struct-array max — each marker regex appears exactly
    # once in the plan.  (The earlier nested-when fold duplicated the
    # running-max subtree per language: ~2^5 copies of every
    # regexp_extract_all, which codegen does not CSE across
    # conditional branches — 10x the regex work per row.)
    # Struct comparison is field-order: hits first, then priority
    # (higher = earlier language), so strictly-greater wins and ties
    # keep the earlier language — same argmax as before.
    n = len(LANG_MARKERS)
    arr = F.array(
        *[
            F.struct(
                _marker_hits(text, ws).alias("n"),
                F.lit(n - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, ws) in enumerate(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(arr)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band, alpha ratio,
    punctuation density, mean word length band, stopword presence.
    Mirrors C4/Gopher-style filters; each component SQL-expressible."""
    n_chars = F.length(text)
    n_tokens = F.size(tokens(text))
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    stop = _marker_hits(text, LANG_MARKERS["en"])
    mean_wl = F.when(n_tokens > 0, alpha / n_tokens).otherwise(F.lit(0.0))
    s_len = F.when((n_chars >= 200) & (n_chars <= 20000), 1.0).when(n_chars >= 50, 0.5).otherwise(0.0)
    s_alpha = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    s_punct = F.when(n_chars > 0, 1.0 - F.least(F.lit(1.0), punct * 10.0 / n_chars)).otherwise(F.lit(0.0))
    s_wl = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.5)
    s_stop = F.when(n_tokens > 0, F.least(F.lit(1.0), stop * 4.0 / n_tokens)).otherwise(F.lit(0.0))
    return F.round((s_len + s_alpha + s_punct + s_wl + s_stop) / 5.0, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (rolling-hash analog; md5 so a DuckDB oracle reproduces it
    bit-for-bit)."""
    norm = F.array_join(tokens(text), " ")
    return F.md5(norm.cast("binary"))


def vocab_topk(df, text_col: str, k: int = 100, id_col: str | None = None):
    """Corpus vocabulary top-k: token → total occurrences (+ document
    frequency when ``id_col`` is given), the highest-`k` by occurrence
    count (count desc, token asc tiebreak so the result is
    deterministic).

    Scale shape: explode → ONE hash aggregate (map-side combined: the
    shuffle carries per-partition partial counts, ~|vocab| rows per
    partition, never the token stream) → global top-k via
    TakeOrdered (per-partition heads, no full sort of the vocabulary).
    With ``id_col``, ``doc_freq`` rides the same aggregate as a
    count_distinct (Spark's two-phase distinct aggregation: the
    partial phase dedups (token, doc) pairs map-side before the
    shuffle).  At 100 TB this is the standard corpus-stats pass.
    """
    from pyspark.sql import functions as F

    if id_col is None:
        tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        counts = tok.groupBy("token").agg(
            F.count(F.lit(1)).alias("occurrences")
        )
    else:
        tok = df.select(
            F.col(id_col).alias("__doc"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        counts = tok.groupBy("token").agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.count_distinct("__doc").alias("doc_freq"),
        )
    return counts.orderBy(F.col("occurrences").desc(), F.col("token").asc()).limit(k)
