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
    if strategy == "doubling":
        # one action per round: checkpoint_count materializes the round's
        # closure AND returns the convergence size from the same job
        total, size = L.checkpoint_count(_dedupe(pairs.select(*cols), a, b, gcol))
        step = total
        with L.loop_exec(spark, max(4, total.rdd.getNumPartitions())):
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
                new_total, new_size = L.checkpoint_count(
                    _dedupe(total.unionByName(grown), a, b, gcol)
                )
                L.free(total)  # round k's pairs ⊆ round k+1's
                total = new_total
                if new_size == size:
                    break
                size = new_size
        return total
    step = L.checkpoint(_dedupe(pairs.select(*cols), a, b, gcol))
    # semi-naive: the total is a LAZY union of the step and the per-round
    # delta checkpoints (flat lineage, no per-round O(closure) union
    # re-materialization); each round runs exactly one action — the
    # delta's checkpoint_count job.
    layers = [step]
    delta = step
    step_right_cols = [
        F.col(a + "__id").alias("__mid"), F.col(b), F.col(b + "__id")
    ] + ([F.col(gcol + "__id")] if gcol else [])
    step_right = step.select(*step_right_cols)
    anti_keys = [a + "__id", b + "__id"] + ([gcol + "__id"] if gcol else [])
    with L.loop_exec(spark, max(4, step.rdd.getNumPartitions())):
        for _ in fixpoint_rounds(max_iter, "transitive_closure(seminaive)"):
            delta_cols = [
                F.col(a), F.col(a + "__id"), F.col(b + "__id").alias("__mid")
            ] + [F.col(c) for c in gcols]
            grown = (
                delta.select(*delta_cols)
                .join(step_right, join_keys)
                .select(*cols)
            )
            total_keys = layers[0].select(*anti_keys)
            for l in layers[1:]:
                total_keys = total_keys.unionByName(l.select(*anti_keys))
            new_delta, n = L.checkpoint_count(
                _dedupe(grown, a, b, gcol).join(total_keys, anti_keys, "left_anti")
            )
            if n == 0:
                L.free(new_delta)
                break
            layers.append(new_delta)
            layers = L.compact_layers(layers)
            delta = new_delta
    total = layers[0]
    for l in layers[1:]:
        total = total.unionByName(l)
    return L.adopt(total, *layers)


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
    # BFS with the reached set as a lazy union of per-round layer
    # checkpoints — one checkpoint_count action per round (see bfs()).
    frontier, n = L.checkpoint_count(
        step.where(F.col(a + "__id") == seed_id)
        .select(
            F.col(b).alias("n"), F.col(b + "__id").alias("n__id"),
            *[F.col(c) for c in gcols],
        )
        .dropDuplicates(fkeys)
    )
    layers = [frontier]
    with L.loop_exec(spark, max(4, step.rdd.getNumPartitions())):
        step_fwd = L.checkpoint(
            step.select(
                F.col(a + "__id").alias("n__id"), F.col(b).alias("m"),
                F.col(b + "__id").alias("m__id"),
                *([F.col(gcol + "__id")] if gcol else []),
            )
            .repartition(max(4, step.rdd.getNumPartitions()), *fkeys)
            .sortWithinPartitions(*fkeys)
        )
        for _ in fixpoint_rounds(max_iter, "reachable_pairs"):
            if n == 0:
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
            reached_keys = layers[0].select(*fkeys)
            for l in layers[1:]:
                reached_keys = reached_keys.unionByName(l.select(*fkeys))
            new_frontier, n = L.checkpoint_count(
                grown.join(reached_keys, fkeys, "left_anti")
            )
            if n == 0:
                L.free(new_frontier)
                break
            layers.append(new_frontier)
            layers = L.compact_layers(layers)
            frontier = new_frontier
        L.free(step, step_fwd)
    reached = layers[0]
    for l in layers[1:]:
        reached = reached.unionByName(l)
    reached = L.adopt(reached, *layers)
    return reached.select(
        seed.alias(a),
        T.term_id(seed).alias(a + "__id"),
        F.col("n").alias(b),
        F.col("n__id").alias(b + "__id"),
        *[F.col(c) for c in gcols],
    )
