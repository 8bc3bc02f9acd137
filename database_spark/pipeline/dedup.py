"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline extensions (no reference equivalent; designed
for 100 TB corpora):

* exact: one hash-aggregate, no shuffle beyond the groupBy.
* n-gram Jaccard: exact pairwise similarity via shingle inverted index
  (explode → per-shingle posting lists → inline ordered-pair emission
  → count).  Heavy-hitter shingles are capped (`max_df`) exactly like
  stop-shingle removal in production dedup pipelines — otherwise one
  viral shingle produces a quadratic pair blowup; the cap also bounds
  each posting list, so the collect is memory-safe.
* MinHash-LSH: the scale path — k permutations via `xxhash64(shingle,
  seed_i)` min-aggregated, banded; candidate pairs only where a band
  matches, then exact-verify.  O(n·k) + band-join instead of O(n²).
* SimHash: 64-bit signature from token hashes; near-dup = Hamming ≤ r,
  banded by 4×16-bit chunks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_RE, tokens


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents (by md5 of raw text).
    Returns (hash, n_dups, keep_id) for groups with n>1."""
    h = F.md5(F.col(text_col).cast("binary"))
    return (
        df.select(h.alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative of each identical-text group."""
    h = F.md5(F.col(text_col).cast("binary"))
    keep = (
        df.select(h.alias("__h"), F.col(id_col).alias("__id"))
        .groupBy("__h")
        .agg(F.min("__id").alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingles(text: Column, n: int = 3) -> Column:
    """n-gram (over tokens) shingle strings."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """All-pairs token-n-gram Jaccard ≥ threshold (a < b).

    Inverted-index postings on shingles (each shingle's sorted doc
    list emits its pairs directly — no self-join of the exploded
    table); `max_df` drops shingles appearing in more than that many
    docs (stop-shingles) — at 100 TB this is the difference between a
    bounded pair emission (≤ max_df²/2 per shingle, posting lists
    memory-bounded) and a quadratic blowup.  ``max_df=None`` disables
    the cap AND switches pair generation back to the self-join shape,
    whose worst case is extra output rows rather than unbounded
    per-group collect_list state.  When
    `max_df` fires, the Jaccard is over the *surviving* (non-stop)
    shingle sets on both the numerator and the denominator — doc sizes
    are counted after the filter, so the ratio stays consistent instead
    of being biased low.  Returns (id_a, id_b, jaccard).
    """
    from . import spread_narrow

    df = spread_narrow(df)  # shingle explosion parallelism (no-op at scale)
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh")
    )
    if max_df is not None:
        # the hot set is tiny (only shingles with df > max_df), so the
        # cap costs one map-side-combined count + a broadcast anti join
        hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") > max_df)
        sh = sh.join(hot.select("sh"), "sh", "left_anti")
    # sizes AFTER the stop-shingle filter: numerator and denominator
    # must use the same shingle universe.  Computed as a second branch
    # off `sh` (scan → shingle → broadcast-anti → map-side-combined
    # count): measured cheaper than hanging sizes off the postings
    # exchange (which duplicates the sh shuffle + collect_list) and
    # cheaper than checkpointing the postings (materialization cost
    # 3x the branch recomputation at bench scale)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is None:
        # no stop-shingle cap → a posting list would be UNBOUNDED
        # per-group state (one viral shingle OOMs an executor where a
        # self-join merely emits more rows): keep the memory-safe
        # self-join shape for this documented parameter.  Slower (two
        # shuffles of the exploded table) but degrades gracefully.
        a = sh.select(F.col("id").alias("id_a"), "sh")
        b = sh.select(F.col("id").alias("id_b"), "sh")
        common = (
            a.join(b, "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        # pair generation from sorted posting lists: ONE shuffle of
        # the exploded shingles (collect_list per shingle, bounded by
        # max_df so no unbounded per-group state), then each posting
        # list emits its d·(d-1)/2 ordered pairs inline — replaces the
        # former a⋈b self-join, which shuffled the exploded table twice
        post = sh.groupBy("sh").agg(
            F.sort_array(F.collect_list("id")).alias("ids")
        )
        pair_structs = F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        common = (
            post.select(F.explode(pair_structs).alias("p"))
            .select("p.id_a", "p.id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, i).  One explode + one groupBy; JVM-side only."""
    from . import spread_narrow

    df = spread_narrow(df)  # shingle explosion needs the whole cluster
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    mins = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH (+ optional exact
    Jaccard verification of candidates).

    bands=16 over 64 hashes (r=4) → P(candidate) = 1-(1-s^4)^16:
    s=0.5 → 64%, s=0.8 → 99.98%.  Returns (id_a, id_b[, jaccard]).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    bands_df = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[i] for i in range(b * rows, (b + 1) * rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    )
    l = bands_df.select(F.col("id").alias("id_a"), "band", "bh")
    r = bands_df.select(F.col("id").alias("id_b"), "band", "bh")
    cand = (
        l.join(r, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    if not verify:
        return cand
    docs = df.select(F.col(id_col).alias("id"), F.array_distinct(shingles(F.col(text_col), n)).alias("shs"))
    out = (
        cand.join(docs.withColumnRenamed("id", "id_a").withColumnRenamed("shs", "sh_a"), "id_a")
        .join(docs.withColumnRenamed("id", "id_b").withColumnRenamed("shs", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def md5_token_hash(tok: Column, bits: int = 60) -> Column:
    """Portable token hash: top `bits` bits of md5, as a positive long.

    Unlike xxhash64 this is reproducible in any engine with md5 +
    hex→int (the DuckDB oracle re-derives the identical value), at the
    cost of ~2x the hash work — use for cross-engine-verified runs.
    """
    return F.conv(F.substring(F.md5(tok), 1, bits // 4), 16, 10).cast("long")


def simhash(text: Column, bits: int = 64, token_hash=None) -> Column:
    """SimHash over tokens: per-bit majority vote of token hashes.
    Pure column expressions (aggregate over the token array).

    ``token_hash``: Column→Column hash function (default xxhash64,
    JVM-fast; pass :func:`md5_token_hash` for a cross-engine
    reproducible signature)."""
    toks = F.array_distinct(tokens(text))
    if token_hash is None:
        token_hash = lambda t: F.xxhash64(t)  # noqa: E731 — *cols signature
        # is rejected by transform()'s lambda introspection; wrap it
    hashes = F.transform(toks, token_hash)

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(bit_sum(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return out


def _simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """(id, sh) SimHash signatures, computed relationally.

    The column-expression form (:func:`simhash`) evaluates ``bits``
    interpreted higher-order aggregates per row — HOF lambdas sit
    outside whole-stage codegen, so a 60-bit signature costs 60
    interpreted passes over the token array.  Exploding to
    (id, token-hash, bit) rows keeps everything in codegen'd
    hash-aggregates with map-side partial aggregation — the
    shape that scales (shuffle keyed on (id, bit), combiner-friendly).
    Bit-for-bit identical to :func:`simhash` (same vote and fold
    arithmetic; empty-token docs get signature 0)."""
    from database_spark.pipeline.text import tokens

    from . import spread_narrow

    if token_hash is None:
        token_hash = lambda t: F.xxhash64(t)  # noqa: E731
    spark = df.sparkSession
    df = spread_narrow(df)  # tokenization + bit explosion parallelism
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    # explode_outer keeps zero-token docs (NULL token -> NULL hash ->
    # vote 0 on every bit -> signature 0, matching the aggregate form)
    hashed = toks.select("id", F.explode_outer("toks").alias("tok")).select(
        "id",
        F.when(F.col("tok").isNotNull(), token_hash(F.col("tok"))).alias("h"),
    )
    bitdf = spark.range(bits).select(F.col("id").cast("int").alias("bit"))
    votes = hashed.crossJoin(F.broadcast(bitdf)).select(
        "id",
        "bit",
        F.when(F.col("h").isNull(), F.lit(0))
        .when(
            F.call_function("shiftright", F.col("h"), F.col("bit")).bitwiseAND(
                F.lit(1)
            )
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("vote"),
    )
    return (
        votes.groupBy("id", "bit")
        .agg(F.sum("vote").alias("s"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"), F.col("bit")
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("sh")
        )
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Banded by pigeonhole: with n_chunks = max_hamming+1 equal bit
    slices, any pair within the distance bound shares ≥1 exact chunk,
    so the join is on chunk equality, not all-pairs.  max_hamming ≤ 7
    keeps chunks ≥8 bits (selective); larger bounds fall back to wider
    chunk counts with shorter chunks.  Returns (id_a, id_b, hamming).
    """
    n_chunks = min(max_hamming + 1, 16)
    width = bits // n_chunks
    mask = (1 << width) - 1
    sh = _simhash_signatures(df, id_col, text_col, bits, token_hash)
    chunks = sh.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), width * i).bitwiseAND(F.lit(mask))
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk", "cv"),
    )
    l = chunks.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "chunk", "cv")
    r = chunks.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "chunk", "cv")
    cand = (
        l.join(r, ["chunk", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate CLUSTERING — the full training-data dedup pass:
    MinHash-LSH candidate pairs (exact-verified) → undirected connected
    components over the pair graph (min-id cluster label) → one
    canonical representative per cluster (longest text, ties to the
    smallest id).

    Returns (id, cluster, keep): ``keep`` marks the representative; a
    dedup pipeline filters ``keep`` and drops the rest.

    100 TB design: pairs are banded-join candidates (never all-pairs);
    the component walk is the frontier-based min-label propagation of
    ``operators.graph.connected_components`` (diameter-bounded rounds);
    the representative pick is one max_by aggregate.  Every stage is a
    keyed shuffle — no driver materialization of the corpus.
    """
    from ..operators.graph import connected_components

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n, num_hashes, bands, threshold
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = connected_components(edges)
    ids = df.select(
        F.col(id_col).alias("node"), F.length(F.col(text_col)).alias("len")
    )
    labeled = ids.join(comps, "node", "left_outer").select(
        "node",
        F.coalesce(F.col("component"), F.col("node")).alias("cluster"),
        "len",
    )
    rep = labeled.groupBy("cluster").agg(
        F.max_by("node", F.struct(F.col("len"), -F.col("node"))).alias("rep")
    )
    return labeled.join(rep, "cluster").select(
        F.col("node").alias("id"),
        "cluster",
        (F.col("node") == F.col("rep")).alias("keep"),
    )


def embedding_near_dup_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERING — the dedup-family
    use of the embedding space: hyperplane-LSH candidate pairs
    (exact-cosine verified, ``similarity.lsh_similar_pairs``) →
    connected components over the pair graph → ``keep`` marks the
    min-id representative of each cluster (the cluster label itself —
    deterministic; a production pipeline would rank by a quality
    score, which slots into the same ``max_by``).

    Returns (id, cluster, keep) for EVERY input row (singletons are
    their own cluster and kept).

    100 TB design: candidates come from banded (table, bucket) joins —
    never all-pairs; pairs travel as bare ids; the component walk is
    the two-phase contraction of ``operators.graph
    .connected_components`` (O(log² n) rounds); the final labeling is
    one left join + column compare.  No driver materialization.
    """
    from ..operators.graph import connected_components
    from .similarity import lsh_similar_pairs

    pairs = lsh_similar_pairs(
        df, id_col, vec_col, dim, threshold, n_planes, n_tables,
        probe_hamming=probe_hamming,
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = connected_components(edges)
    ids = df.select(F.col(id_col).alias("node"))
    labeled = ids.join(comps, "node", "left_outer").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("cluster")
    )
    return labeled.select(
        F.col("node").alias("id"),
        "cluster",
        (F.col("node") == F.col("cluster")).alias("keep"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    the merged token ranges whose ``width``-token shingle occurs at
    least ``min_count`` times anywhere in the corpus.  Downstream
    pipelines cut these spans instead of dropping whole documents.

    Returns (id, span_start, span_end) in token coordinates
    (start inclusive, end exclusive, end - start >= width).

    Scale shape — the suffix-array pass re-expressed relationally:

    1. per-row shingle hashing: md5 over each width-token window,
       built from the token ARRAY with ``F.slice`` inside a transform
       (map-only; the token stream is never exploded for hashing);
    2. ONE hash aggregate over shingle hashes (map-side combined) for
       corpus-wide occurrence counts — never a self-join;
    3. join the (doc, pos, hash) stream back to the duplicated-hash
       set — both sides hash-partitioned by the md5, so skew is
       salted by uniformity of the hash itself;
    4. per-document interval merge of overlapping [pos, pos+width)
       windows — a classic lag/cummax window over (doc, pos), linear
       per document.

    Cost at 100 TB: two shuffles of the shingle stream (agg + join
    back), each keyed by uniform hashes.  The reference's nearest
    feature is the full-text index; this operator is corpus-dedup
    specific (no blazegraph analog).
    """
    # a small single-file scan would run tokenization + per-window
    # hashing on 1-2 cores AND recompute it for both consumers of the
    # occurrence stream (count aggregate and join-back).  Spread the
    # pre-explosion side when the scan is narrower than the cluster;
    # already-wide inputs (the 100 TB case) skip the extra shuffle.
    # (Same expansion-blind-parallelism fix as lsh_similar_pairs.)
    from . import spread_narrow

    df = spread_narrow(df)
    t = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    tk = F.col("__toks")
    n = F.size(tk)
    sh = F.when(
        n >= width,
        F.transform(
            F.sequence(F.lit(1), n - (width - 1)),
            lambda i: F.md5(
                F.array_join(F.slice(tk, i, width), " ").cast("binary")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = t.select(
        F.col(id_col), F.posexplode(sh).alias("__i", "__h")
    ).select(
        F.col(id_col), (F.col("__i") + 1).alias("pos"), F.col("__h")
    )
    hot = (
        occ.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("__h")
    )
    dup = occ.join(hot, "__h").select(F.col(id_col), "pos")
    # interval merge: a window starts a new group iff it begins after
    # every earlier window in the doc has ended
    from pyspark.sql.window import Window

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = dup.withColumn(
        "__new",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + width).over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__grp", F.sum("__new").over(w_run))
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(
            (F.min("pos") - 1).alias("span_start"),
            (F.max("pos") - 1 + width).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )
