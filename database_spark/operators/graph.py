"""Graph analytics as iterative DataFrame programs.

Reference: the GAS (gather-apply-scatter) engine —
``bigdata-gas/.../IGASProgram.java:109-185`` with concrete analytics
``analytics/BFS.java``, ``SSSP.java``, ``CC.java``, ``PR.java`` —
invoked from SPARQL through ``GASService.java:136``.

Spark-native design: each program is a driver-side loop of DataFrame
joins (message passing = frontier ⋈ edges, apply = groupBy-aggregate),
with ``localCheckpoint`` per round to truncate lineage.  This is the
same computational shape GraphX/Pregel would run; doing it directly on
DataFrames keeps Tungsten codegen and AQE skew handling, and needs no
Scala bridge.

Edge frames use long node ids (term ids): `src`, `dst` (+ `weight`
double for SSSP).  At 100 TB scale: edges are hash-partitioned by src
once and reused every iteration (one shuffle per round, not two); hub
skew is split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .iterate import fixpoint_rounds


def bfs(edges: DataFrame, seeds: DataFrame, max_iter: int | None = None) -> DataFrame:
    """Breadth-first search (GAS/analytics/BFS.java).

    seeds: df with `node` column. Returns (node, depth) for every
    reachable node (seed depth 0).
    """
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()
    frontier = (
        seeds.select(F.col("node"), F.lit(0).alias("depth"))
        .dropDuplicates(["node"])
        .localCheckpoint()
    )
    # visited stays a lazy union over the checkpointed per-depth layers:
    # every leaf is materialized, so lineage depth is constant and we
    # never re-materialize the whole (growing) visited set each round —
    # only the new frontier layer is checkpointed.
    visited = frontier
    depth = 0
    for _ in fixpoint_rounds(max_iter, "bfs"):
        depth += 1
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def sssp(edges: DataFrame, seeds: DataFrame, max_iter: int | None = None) -> DataFrame:
    """Single-source shortest paths, weighted (GAS/analytics/SSSP.java).

    edges needs `weight`; returns (node, dist). Frontier-based
    Bellman-Ford: only improved nodes scatter next round.
    """
    e = edges.select("src", "dst", "weight").localCheckpoint()
    dist = seeds.select(F.col("node"), F.lit(0.0).alias("dist")).dropDuplicates(["node"]).localCheckpoint()
    frontier = dist
    for _ in fixpoint_rounds(max_iter, "sssp"):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        joined = cand.join(dist, "node", "left_outer")
        improved = joined.where(F.col("dist").isNull() | (F.col("nd") < F.col("dist"))).select(
            "node", F.col("nd").alias("dist")
        ).localCheckpoint()
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint()
        )
        frontier = improved
    return dist


def connected_components(edges: DataFrame, max_iter: int | None = None) -> DataFrame:
    """Undirected connected components by min-label propagation
    (GAS/analytics/CC.java). Returns (node, component=min node id)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in fixpoint_rounds(max_iter, "connected_components"):
        nbr_min = (
            labels.join(sym, labels["node"] == sym["src"])
            .select(F.col("dst").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nc"))
        )
        merged = labels.join(nbr_min, "node", "left_outer").select(
            "node",
            F.least(F.col("component"), F.coalesce(F.col("nc"), F.col("component"))).alias(
                "new_component"
            ),
            "component",
        )
        changed = merged.where(F.col("new_component") < F.col("component"))
        labels = merged.select("node", F.col("new_component").alias("component")).localCheckpoint()
        if changed.isEmpty():
            break
    return labels


def pagerank(
    edges: DataFrame,
    iters: int = 20,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank (GAS/analytics/PR.java). Returns (node, rank).

    Power iteration with dangling-mass redistribution; rank mass sums
    to N like the classic formulation (1-d) + d*sum.
    """
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "inner")
            .join(e, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left_outer")
            .select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


# --------------------------------------------------------------- service
GAS_NS = "http://www.bigdata.com/rdf/gas#"


def make_gas_service():
    """SERVICE <gas:service> {...} handler (GASService.java:136,143).

    Config triple patterns inside the group:
      gas:program gas:gasClass "BFS"|"SSSP"|"CC"|"PR" ;
                  gas:linkType <pred> ;
                  gas:in <seed> ;
                  gas:out ?node ; gas:out1 ?depthOrValue .
    """
    from .. import terms as T
    from ..sparql import ast as A
    from ..sparql.compiler import Sol
    from ..sparql.functions import pack_double, pack_integer

    def handler(compiler, sp, graph):
        cfg: dict[str, list] = {}
        for el in sp.group.elements:
            if isinstance(el, A.TriplePattern) and isinstance(el.p, A.Const):
                key = el.p.term.lex.rsplit("#", 1)[-1]
                cfg.setdefault(key, []).append(el.o)
        cls = cfg["gasClass"][0].term.lex.rsplit(".", 1)[-1].upper()
        trips = compiler.triples.where(F.col("g").isNull())
        if "linkType" in cfg:
            trips = trips.where(
                F.col("p") == T.term_id(T.lit_term(cfg["linkType"][0].term))
            )
        edges = trips.select(
            F.col("s").alias("src"), F.col("o").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        node_terms = (
            trips.select(F.col("s").alias("node"), F.col("st").alias("nt"))
            .unionByName(trips.select(F.col("o").alias("node"), F.col("ot").alias("nt")))
            .dropDuplicates(["node"])
        )
        out_var = cfg["out"][0].name if "out" in cfg and isinstance(cfg["out"][0], A.Var) else None
        out1_var = cfg["out1"][0].name if "out1" in cfg and isinstance(cfg["out1"][0], A.Var) else None
        spark = compiler.spark
        if cls in ("BFS", "SSSP"):
            seeds = spark.range(1).select(
                *[T.term_id(T.lit_term(s.term)).alias("node") for s in cfg["in"][:1]]
            )
            result = bfs(edges, seeds) if cls == "BFS" else sssp(edges, seeds)
            val_col = "depth" if cls == "BFS" else "dist"
            pack = pack_integer if cls == "BFS" else pack_double
        elif cls == "CC":
            result = connected_components(edges)
            val_col = "component"
            pack = pack_integer
        elif cls == "PR":
            result = pagerank(edges)
            val_col = "rank"
            pack = pack_double
        else:
            raise ValueError(f"unknown GAS program {cls}")
        out = result.join(node_terms, "node")
        sel = []
        vars_ = set()
        if out_var:
            sel += [F.col("nt").alias(out_var), F.col("node").alias(out_var + "__id")]
            vars_.add(out_var)
        if out1_var:
            if cls == "CC":
                # component id re-labeled by its node term
                comp_terms = node_terms.withColumnRenamed("node", val_col).withColumnRenamed("nt", "ct")
                out = out.join(comp_terms, val_col)
                packed = F.col("ct")
            else:
                packed = pack(F.col(val_col))
            sel += [
                packed.alias(out1_var),
                T.term_id(packed).alias(out1_var + "__id"),
            ]
            vars_.add(out1_var)
        return Sol(out.select(*sel), vars_, set())

    return {GAS_NS: handler}
