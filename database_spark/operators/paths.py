"""Iterative fixpoint operators: transitive closure / directed reachability.

Reference: ``ArbitraryLengthPathOp.java:48`` + ``ArbitraryLengthPathTask``
(1302 LoC) evaluate `*`/`+` property paths by iterating a subquery plan
until no new solutions appear.  Spark version: a driver-side semi-naive
datalog loop over DataFrames — each round joins only the *delta* against
the step relation (not the whole closure), anti-joins out known pairs,
and ``localCheckpoint``s to truncate lineage (without it the plan tree
doubles per iteration and the job dies at scale long before the data
does).

Scale notes: the step relation is cached once; each round is one
shuffle-join keyed on the frontier column; skewed hub nodes are handled
by AQE skew-join splitting.  When one endpoint of the path is bound we
run directed BFS from the seed (frontier = node set, not pair set) —
O(reachable) instead of O(all-pairs), which is the difference between
LUBM-style queries finishing and not finishing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import terms as T
from . import lifecycle as L
from .iterate import fixpoint_rounds


def _dedupe(df: DataFrame, a: str, b: str, gcol: str | None = None) -> DataFrame:
    keys = [a + "__id", b + "__id"]
    if gcol:
        keys.append(gcol + "__id")
    return df.dropDuplicates(keys)


def transitive_closure(
    spark: SparkSession,
    pairs: DataFrame,
    a: str,
    b: str,
    max_iter: int | None = None,
    strategy: str = "doubling",
    gcol: str | None = None,
) -> DataFrame:
    """All-pairs transitive closure of the step relation `pairs`.

    `pairs` columns: a, a__id, b, b__id (term struct + id per endpoint).

    ``gcol``: optional partition column (graph context for paths under
    GRAPH ?var — reference ``ArbitraryLengthPathOp`` runs inside any
    graph scope): `pairs` additionally carries gcol + gcol__id and the
    closure is computed independently per gcol value — the step join is
    keyed on (gcol__id, node), so one Spark job still closes every
    graph at once (no per-graph driver loop).

    ``strategy="doubling"`` (default): path doubling — after round k the
    result holds every pair connected by a path of ≤ 2^k edges, so a
    diameter-d graph converges in ⌈log2 d⌉ rounds instead of d.  On a
    cluster, synchronization barriers per round are the dominant cost of
    an iterative job (and locally it's ~0.3s of scheduling per round),
    so log-depth wins whenever the output is all-pairs anyway — the
    O(n²) pair set is the same either way, we just reach it in
    exponentially fewer shuffles.

    ``strategy="seminaive"``: delta_{k+1} = (delta_k ⋈ step) − total_k,
    one edge per round.  Preferable when the closure is later filtered
    so heavily that most doubling-round intermediate pairs are wasted,
    or when the step relation is far smaller than the closure and
    re-joining total⋈total would shuffle more bytes per round than the
    extra rounds cost.
    """
    gcols = [gcol, gcol + "__id"] if gcol else []
    cols = [a, a + "__id", b, b + "__id"] + gcols
    join_keys = ["__mid"] + ([gcol + "__id"] if gcol else [])
    step = L.checkpoint(_dedupe(pairs.select(*cols), a, b, gcol))
    if strategy == "doubling":
        total = step
        size = total.count()
        for _ in fixpoint_rounds(max_iter, "transitive_closure(doubling)"):
            right_cols = [
                F.col(a + "__id").alias("__mid"), F.col(b), F.col(b + "__id")
            ] + ([F.col(gcol + "__id")] if gcol else [])
            right = total.select(*right_cols)
            left_cols = [
                F.col(a), F.col(a + "__id"), F.col(b + "__id").alias("__mid")
            ] + [F.col(c) for c in gcols]
            grown = (
                total.select(*left_cols)
                .join(right, join_keys)
                .select(*cols)
            )
            new_total = L.checkpoint(_dedupe(total.unionByName(grown), a, b, gcol))
            new_size = new_total.count()
            L.free(total)  # round k's pairs are a subset of round k+1's
            total = new_total
            if new_size == size:
                break
            size = new_size
        return total
    total = step
    delta = step
    step_right_cols = [
        F.col(a + "__id").alias("__mid"), F.col(b), F.col(b + "__id")
    ] + ([F.col(gcol + "__id")] if gcol else [])
    step_right = step.select(*step_right_cols)
    anti_keys = [a + "__id", b + "__id"] + ([gcol + "__id"] if gcol else [])
    for _ in fixpoint_rounds(max_iter, "transitive_closure(seminaive)"):
        delta_cols = [
            F.col(a), F.col(a + "__id"), F.col(b + "__id").alias("__mid")
        ] + [F.col(c) for c in gcols]
        grown = (
            delta.select(*delta_cols)
            .join(step_right, join_keys)
            .select(*cols)
        )
        new_delta = L.checkpoint(
            _dedupe(grown, a, b, gcol).join(
                total.select(*anti_keys), anti_keys, "left_anti"
            )
        )
        if new_delta.isEmpty():
            L.free(new_delta)
            if delta is not total and delta is not step:
                L.free(delta)
            break
        new_total = L.checkpoint(total.unionByName(new_delta))
        if total is not step:
            L.free(total)
        if delta is not step and delta is not total:
            L.free(delta)
        total, delta = new_total, new_delta
    if step is not total:
        L.free(step)  # step pairs are contained in the returned closure
    return total


def reachable_pairs(
    spark: SparkSession,
    pairs: DataFrame,
    a: str,
    b: str,
    seed: Column,
    seed_side: str,
    max_iter: int | None = None,
    gcol: str | None = None,
) -> DataFrame:
    """Directed closure from a bound endpoint: pairs (seed, x) with x
    reachable in ≥1 step (seed_side='a'), or (x, seed) (seed_side='b').

    Frontier is a NODE set (not pair set): O(V) state instead of O(V²).
    With ``gcol`` the frontier is a (graph, node) set and each graph's
    BFS proceeds independently inside the same jobs.
    """
    gcols = [gcol, gcol + "__id"] if gcol else []
    cols = [a, a + "__id", b, b + "__id"] + gcols
    if seed_side == "b":
        # reverse edges and recurse, then swap back
        rev = pairs.select(
            F.col(b).alias(a), F.col(b + "__id").alias(a + "__id"),
            F.col(a).alias(b), F.col(a + "__id").alias(b + "__id"),
            *[F.col(c) for c in gcols],
        )
        out = reachable_pairs(spark, rev, a, b, seed, "a", max_iter, gcol)
        return out.select(
            F.col(b).alias(a), F.col(b + "__id").alias(a + "__id"),
            F.col(a).alias(b), F.col(a + "__id").alias(b + "__id"),
            *[F.col(c) for c in gcols],
        ).select(*cols)

    step = L.checkpoint(_dedupe(pairs.select(*cols), a, b, gcol))
    seed_id = T.term_id(seed)
    fkeys = ["n__id"] + ([gcol + "__id"] if gcol else [])
    frontier = L.checkpoint(
        step.where(F.col(a + "__id") == seed_id)
        .select(
            F.col(b).alias("n"), F.col(b + "__id").alias("n__id"),
            *[F.col(c) for c in gcols],
        )
        .dropDuplicates(fkeys)
    )
    reached = frontier
    step_fwd = step.select(
        F.col(a + "__id").alias("n__id"), F.col(b).alias("m"), F.col(b + "__id").alias("m__id"),
        *([F.col(gcol + "__id")] if gcol else []),
    )
    for _ in fixpoint_rounds(max_iter, "reachable_pairs"):
        if frontier.isEmpty():
            break
        grown = (
            frontier.select(*fkeys, *([gcol] if gcol else []))
            .join(step_fwd, fkeys)
            .select(
                F.col("m").alias("n"), F.col("m__id").alias("n__id"),
                *[F.col(c) for c in gcols],
            )
            .dropDuplicates(fkeys)
        )
        new_frontier = L.checkpoint(
            grown.join(reached.select(*fkeys), fkeys, "left_anti")
        )
        if new_frontier.isEmpty():
            L.free(new_frontier)
            break
        new_reached = L.checkpoint(reached.unionByName(new_frontier))
        L.free(reached)
        if frontier is not reached:
            L.free(frontier)
        reached, frontier = new_reached, new_frontier
    L.free(step)
    if frontier is not reached:
        L.free(frontier)
    return reached.select(
        seed.alias(a),
        T.term_id(seed).alias(a + "__id"),
        F.col("n").alias(b),
        F.col("n__id").alias(b + "__id"),
        *[F.col(c) for c in gcols],
    )
