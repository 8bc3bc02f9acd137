"""Deterministic Lloyd k-means over embedding columns.

The trained counterpart to the trainless IVF cells in
``pipeline/similarity.py``: a fixed number of Lloyd iterations with a
deterministic seed (the ``k`` lowest ids), producing cluster
assignments usable as IVF cells for ANN probing at 100 TB.

Why it can be hash-verified against a SQL oracle at all — three
determinism devices:

1. **Fixed-point centroid sums.** Cross-row double summation is
   order-dependent under Spark's partial aggregation, so centroids
   would drift run-to-run at the ULP level.  Instead every component
   is quantized once to an integer (``round(x * scale)`` as BIGINT)
   and the per-cell/per-dimension sums run in exact integer
   arithmetic — order-independent, overflow-safe to ~9e9 rows per
   cell at scale=1e6 (documented limit; raise ``scale`` down or shard
   cells past that).
2. **Per-row folds only for distances.** Squared-L2 runs as a
   sequential ``F.aggregate`` fold over the dimension axis (fixed
   order, bit-reproducible), then rounds to 1e-9 before the argmin so
   a DuckDB ``list_sum`` oracle agrees even if its fold tree differs.
3. **Total-order tie-breaks.** Seed cells are ranked by id; argmin
   ties break toward the lowest cell index.

Scale shape per iteration: one map-only assignment pass (centroids are
DATA in a one-row broadcast relation — generic in k and dim, so large
k never breaks codegen) + one hash aggregate of (cell, dim) partial
sums.  Driver state is the k×dim centroid matrix only — model state,
never data.

Reference parity: no blazegraph analog (nearest is the GAS analytics
family); this is a training-data-pipeline extension like MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantized(df: DataFrame, id_col: str, vec_col: str, scale: int):
    return df.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("long"),
        ).alias("__vi"),
    )


def _assign(base: DataFrame, cents: list[list[float]], scale: int):
    """Attach ``__cell`` = argmin_j round(||v - c_j||², 1e-9), ties to
    the lowest j.

    Centroids travel as DATA — one broadcast row holding the k×dim
    matrix (``array<array<double>>``) — never as literal expression
    trees: a k·dim literal tree breaks whole-stage codegen's 64 KB
    method limit around a few thousand terms (measured for the LSH
    plane constants, which use the same relational-pool fix), capping
    k at toy sizes.  The higher-order-function argmin below is
    constant-size in both k and dim, so k=256 IVF-cell training
    compiles to the same plan as k=8.  The broadcast nested-loop join
    has a single build row: map-only in practice (no shuffle, no row
    multiplication — each row scans the matrix column in place)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    spark = base.sparkSession
    # pandas + Arrow local relation: the list-based createDataFrame
    # routes every action through the Python-RDD worker path (seconds
    # of per-iteration driver latency the codebase elsewhere —
    # similarity.py planes, store.from_python_triples — deliberately
    # avoids), and Lloyd rebuilds this relation once per iteration
    mat = spark.createDataFrame(
        pd.DataFrame({"__mat": [[[float(c) for c in cj] for cj in cents]]}),
        StructType(
            [StructField("__mat", ArrayType(ArrayType(DoubleType())), False)]
        ),
    )
    vd = F.transform(F.col("__vi"), lambda x: x.cast("double") / float(scale))
    withv = base.join(F.broadcast(mat), F.lit(True), "inner").withColumn(
        "__vd", vd
    )
    cand = F.transform(
        F.col("__mat"),
        lambda cj, j: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("__vd"), cj, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                9,
            ).alias("d"),
            j.cast("int").alias("j"),
        ),
    )
    return withv.withColumn("__cell", F.array_min(cand)["j"]).drop("__mat")


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cluster ``vec_col`` into ``k`` cells with ``iters`` Lloyd
    iterations; returns (id_col, cell) with ``cell`` in [0, k).

    Deterministic end-to-end (see module docstring): same data → same
    assignment, regardless of partitioning, so a chained-CTE SQL
    oracle reproduces it bit-for-bit.
    """
    from . import spread_narrow

    base = _quantized(spread_narrow(df), id_col, vec_col, scale).persist()
    seeds = sorted(
        base.orderBy("__id").limit(k).collect(), key=lambda r: r["__id"]
    )
    if not seeds:
        base.unpersist(blocking=False)  # nothing trained; don't leak the cache
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cell int"
        )
    dim = len(seeds[0]["__vi"])
    cents = [[v / float(scale) for v in r["__vi"]] for r in seeds]
    k = len(cents)  # fewer rows than k: every row is its own seed
    from ..operators import lifecycle as L

    # Lloyd is a driver-side fixpoint-style loop: each iteration's
    # (cell, dim) stats collect is the only action, so run it under the
    # static-plan loop profile (one job per iteration instead of the
    # per-iteration AQE stage storm — see lifecycle.loop_exec)
    with L.loop_exec(df.sparkSession, base.rdd.getNumPartitions()):
        for _ in range(iters):
            assigned = _assign(base, cents, scale)
            stats = (
                assigned.select(
                    "__cell", F.posexplode("__vi").alias("__d", "__x")
                )
                .groupBy("__cell", "__d")
                .agg(F.sum("__x").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            sums: dict[tuple[int, int], tuple[int, int]] = {
                (r["__cell"], r["__d"]): (r["s"], r["n"]) for r in stats
            }
            cents = [
                [
                    (float(sums[(j, d)][0]) / sums[(j, d)][1]) / float(scale)
                    for d in range(dim)
                ]
                if (j, 0) in sums
                else cents[j]  # empty cell keeps its previous centroid
                for j in range(k)
            ]
    out = _assign(base, cents, scale).select(
        F.col("__id").alias(id_col), F.col("__cell").alias("cell")
    )
    # the cache only served the training collects; release it so
    # repeated calls don't accumulate executor storage (the final
    # assignment re-derives from the scan — one extra map-only pass)
    base.unpersist(blocking=False)
    return out
