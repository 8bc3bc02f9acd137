"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension: approximate-nearest-neighbor over an
embedding column.  Brute-force cosine is the exactness baseline; the
scale paths are (a) random-hyperplane LSH bucketing and (b) IVF-style
coarse clustering — both cut the candidate set from O(N) to O(N/b) per
query at 100 TB while keeping the final ranking exact within the
candidate pool.

All dot products run as `F.zip_with` + `F.aggregate` column
expressions (JVM codegen, sequential fold → bit-reproducible, so a
DuckDB `list_dot_product` oracle matches after rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_similar_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    Brute-force O(n²) cross join — correct baseline; use
    `lsh_similar_pairs` at scale.  Returns (id_a, id_b, cos).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def cosine_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    Broadcast the query set (queries ≪ data); rank deterministically by
    (cos desc, neighbor id) so ties are stable.  Returns
    (query_id, neighbor_id, cos, rank).
    """
    q = F.broadcast(queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")))
    d = data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("dv"))
    scored = d.crossJoin(q).withColumn("cos", F.round(cosine(F.col("dv"), F.col("qv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane(dim: int, plane_i: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane via splitmix-style
    integer mixing (no numpy state, reproducible everywhere)."""
    out = []
    for j in range(dim):
        x = (plane_i * 1_000_003 + j * 10_007 + seed) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        out.append((x / 2**64) * 2.0 - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (sign pattern → int)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i, seed)])
        sign = F.when(_dot(vec, plane) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + sign
    return bucket


def lsh_similar_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 0,
) -> DataFrame:
    """Scale path for near-dup pairs: candidates from any of `n_tables`
    hyperplane-LSH bucketings, verified with exact cosine.

    Join is per (table, bucket) — expected candidate set shrinks by
    ~2^n_planes per table.  Returns (id_a, id_b, cos).

    ``probe_hamming`` enables MULTIPROBE: a pair is a candidate when
    its codes differ in ≤ that many planes within some table (probe
    side explodes each code into all Hamming-≤R neighbors; the join
    stays an equi-join, never all-pairs).  This is the recall
    compensator for plane counts scaled up with corpus size: adding
    Δ planes drops per-table collision for a pair with plane-agreement
    probability p from p^r to p^(r+Δ); Hamming-1 probing restores
    it to p^(r+Δ) + (r+Δ)·p^(r+Δ-1)·(1-p), which for Δ ≤ 5 is ≥ the
    unscaled p^r across the similarity range that matters (at p=0.64,
    the plane-agreement of cos≈0.42: 8 planes → 0.027, 12 planes +
    H1-probe → 0.035; at p=0.86/cos≈0.9: 0.289 → 0.469).

    REGIME SWITCH — keep ``probe_hamming ≤ 1`` at scale: radius R
    costs Σ C(planes, j≤R) probe masks per doc per table, which is
    combinatorial in R (Δ≈19 at ~10⁹ docs → R=4 under a naive
    ceil(Δ/5) rule → ~20k masks/doc/table — the quadratic blowup the
    plane scaling exists to avoid).  The "O(log n) probes" property
    holds ONLY for R ≤ 1 (1 + planes masks).  Beyond Δ ≈ 5 extra
    planes, restore recall by GROWING ``n_tables`` instead (standard
    b/r banding: ×(1/p) per further plane at the design similarity —
    see ``__spark_entry__._lsh_tables_for``): per-table cost is linear
    in tables and each table's probe volume stays O(planes).
    """
    import itertools
    # plane constants ride as DATA (a broadcast 64-row DataFrame), not
    # as literal expression trees: inlining n_tables*n_planes*dim
    # literals made Catalyst analysis/codegen the dominant cost (~5 s
    # of driver time for 8x8x64) and would grow with every parameter.
    # Signs/dots are computed per (vector, plane) row pair and folded
    # to a bucket id with one aggregation — same arithmetic order as
    # the inlined form, so the oracle's emulated quantizer still
    # matches bit-for-bit.
    spark = df.sparkSession
    plane_rows = [
        (t, i, _hyperplane(dim, i, seed=1000 + t))
        for t in range(n_tables)
        for i in range(n_planes)
    ]
    # pandas+Arrow local relation: a list-based createDataFrame would
    # route the tiny plane table through the Python-RDD worker path
    import pandas as pd

    planes = spark.createDataFrame(
        pd.DataFrame(plane_rows, columns=["table", "plane_i", "plane"]),
        "table int, plane_i int, plane array<double>",
    )
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # expansion-aware parallelism: the plane join multiplies every row
    # by n_tables·n_planes and the per-row dot is the hot loop — a
    # small single-file scan would run the whole signature pass on ONE
    # core (measured 10.1 s → 1.3 s at sf1 from this alone).  Spread
    # the PRE-EXPANSION side only when the scan has fewer partitions
    # than the cluster; already-wide inputs (the 100 TB case) skip the
    # extra shuffle.
    from . import spread_narrow

    base = spread_narrow(base)
    signed = (
        base
        .join(F.broadcast(planes))
        .select(
            "id",
            "table",
            (
                F.when(_dot(F.col("v"), F.col("plane")) >= 0, 1)
                .otherwise(0)
                .cast("long")
                * F.pow(F.lit(2.0), F.lit(n_planes - 1) - F.col("plane_i")).cast("long")
            ).alias("bit"),
        )
    )
    bucket_of = signed.groupBy("id", "table").agg(
        F.sum("bit").alias("bucket")
    )
    buckets = bucket_of.select("id", "table", "bucket")
    # candidate pairs travel as bare (id_a, id_b) through the join and
    # dedupe — carrying the vectors through the pair shuffle costs
    # ~2×dim×8 bytes per candidate row (the dominant cost at any
    # scale); vectors re-attach afterwards via joins on the id, which
    # Catalyst/AQE turns into broadcast joins when the vector table is
    # small and shuffle joins otherwise
    if probe_hamming > 0:
        # probe codes = own bucket XOR every mask with ≤R bits set:
        # matching a probe against the other side's EXACT code is
        # precisely Hamming(code_a, code_b) ≤ R, as an equi-join
        masks = [0]
        for rr in range(1, probe_hamming + 1):
            for combo in itertools.combinations(range(n_planes), rr):
                masks.append(sum(1 << b for b in combo))
        l = buckets.select(
            F.col("id").alias("id_a"),
            "table",
            F.explode(
                F.array(
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(m)).cast("long")
                        for m in masks
                    ]
                )
            ).alias("bucket"),
        )
    else:
        l = buckets.select(F.col("id").alias("id_a"), "table", "bucket")
    r = buckets.select(F.col("id").alias("id_b"), "table", "bucket")
    cand = (
        l.join(r, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification: norms are computed ONCE PER VECTOR (n rows)
    # and ride the joins, not once per candidate pair (the candidate
    # set is orders of magnitude larger).  sqrt(fold(v·v)) then a
    # multiply is the identical IEEE sequence the inline cosine()
    # performed, so thresholds and the rounded value are bit-equal.
    # (A static dim-term expression tree was tried instead of the HOF
    # fold: it breaks whole-stage codegen's 64 KB method limit and
    # falls back to interpreted deep-tree eval — measured 2.5x SLOWER
    # than the fold.  The fold stays; factoring norms is the win.)
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
    )
    cand = (
        cand.join(
            vecs.select(
                F.col("id").alias("id_a"), F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("id").alias("id_b"), F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "id_b",
        )
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.withColumn("cos", F.round(cos, 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize data vectors to `n_cells` cells
    (here: LSH-sign cells — deterministic, trainless), probe the
    `n_probe` nearest cells per query, exact-rank within candidates.

    Trades recall for a ~n_cells/n_probe scan reduction; the cell
    assignment is one pass, reusable across queries (persist it at
    scale).  Returns (query_id, neighbor_id, cos, rank).
    """
    import math

    n_planes = max(1, int(math.log2(n_cells)))
    if dim is None:
        # derive from Arrow/Parquet field metadata when present; only
        # fall back to a one-row probe job (surprise driver job at
        # scale — callers should pass dim explicitly)
        fld = data.schema[vec_col]
        md_dim = (fld.metadata or {}).get("dim")
        dim = int(md_dim) if md_dim else len(data.select(vec_col).head()[0])
    cell = lsh_bucket(F.col(vec_col), dim, n_planes)
    d = data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("dv"), cell.alias("cell"))
    # multi-probe: the query's own cell plus its Hamming-1 neighbors
    # (sign flips of single planes) — same quantizer as the data side
    qcell = lsh_bucket(F.col(qvec_col), dim, n_planes)
    probes = [qcell] + [
        qcell.bitwiseXOR(F.lit(1 << b)) for b in range(min(n_probe - 1, n_planes))
    ]
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).alias("qv"),
        F.explode(F.array_distinct(F.array(*probes))).alias("cell"),
    )
    scored = (
        d.join(F.broadcast(q), "cell")
        .withColumn("cos", F.round(cosine(F.col("dv"), F.col("qv")), 6))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
