"""Driver contract for the spark-graft builder (PySpark target).

Two families of entries, mirroring SURVEY.md §2:

* ``sparql_*`` — run through the actual SPARQL engine
  (``database_spark.sparql.engine.SparqlEngine``) over an RDF graph
  derived from the TPC-H-ish parquet tables via the relational→RDF
  direct mapping (``database_spark.store.rdfize``).  The DuckDB oracle
  expresses the same query relationally, so these check the whole
  stack: mapper → term encoding → parser → algebra compiler → Catalyst.
* relational/pipeline entries — scan/filter/join/agg/window/sort and
  the training-data pipeline ops (dedup, similarity, text stats) as
  DataFrame programs with SQL oracles.

Determinism contract with the oracle: every floating-point aggregate is
computed as an exact DECIMAL(18,6) sum cast back to double on BOTH
sides (a double→decimal(…,6) cast can never hit a round-half tie, so
the bits match across engines); top-k orderings always carry a unique
tiebreak column.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine, term_value
from database_spark.store import RdfMapping, TripleStore, rdfize

TPCH = "urn:tpch:"
PREFIX = f"PREFIX t: <{TPCH}>"

# ---------------------------------------------------------------- graph build

_GRAPH_CACHE: dict = {}


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from database_spark.sources.parquet import read_parquet

    return read_parquet(spark, f"{sf_dir}/{table}.parquet")


_MAPPINGS = {
    "region": RdfMapping(
        "r_regionkey", "urn:r:", {"r_name": TPCH + "name"}, TPCH + "Region"
    ),
    "nation": RdfMapping(
        "n_nationkey",
        "urn:n:",
        {"n_name": TPCH + "name", "n_regionkey": TPCH + "region->urn:r:"},
        TPCH + "Nation",
    ),
    "customer": RdfMapping(
        "c_custkey",
        "urn:c:",
        {
            "c_name": TPCH + "name",
            "c_acctbal": TPCH + "acctbal",
            "c_mktsegment": TPCH + "mktsegment",
            "c_nationkey": TPCH + "nation->urn:n:",
        },
        TPCH + "Customer",
    ),
    "supplier": RdfMapping(
        "s_suppkey",
        "urn:s:",
        {
            "s_name": TPCH + "name",
            "s_acctbal": TPCH + "acctbal",
            "s_nationkey": TPCH + "nation->urn:n:",
        },
        TPCH + "Supplier",
    ),
    "orders": RdfMapping(
        "o_orderkey",
        "urn:o:",
        {
            "o_custkey": TPCH + "customer->urn:c:",
            "o_totalprice": TPCH + "totalprice",
            "o_orderstatus": TPCH + "orderstatus",
            "o_orderpriority": TPCH + "priority",
        },
        TPCH + "Order",
    ),
}


def _graph(spark: SparkSession, sf_dir: str) -> SparqlEngine:
    """rdfize ALL mapped tables into one TripleStore per sf_dir; cached +
    checkpointed so every SPARQL query reuses one materialized graph
    (patterns prune by predicate, so the merged graph costs queries
    nothing while the build cost amortizes across the whole suite)."""
    key = (sf_dir, "__tpch__")
    if key not in _GRAPH_CACHE:
        parts = [
            rdfize(spark, _read(spark, sf_dir, t), _MAPPINGS[t])
            for t in _MAPPINGS
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        store = TripleStore.from_term_structs(spark, u)
        store = TripleStore(spark, store.df.localCheckpoint())
        _GRAPH_CACHE[key] = SparqlEngine(store)
    return _GRAPH_CACHE[key]


def _ring_graph(spark: SparkSession, sf_dir: str) -> SparqlEngine:
    """16-node functional graph u -> (u+5) mod 16 derived from events
    user ids; exercises the arbitrary-length-path fixpoint (cycles!)."""
    key = (sf_dir, "__ring__")
    if key not in _GRAPH_CACHE:
        ev = _read(spark, sf_dir, "events")
        edges = (
            ev.select((F.col("user_id") % 16).alias("src"))
            .withColumn("dst", (F.col("src") + 5) % 16)
            .dropDuplicates(["src", "dst"])
        )
        trips = edges.select(
            T.iri_col(F.concat(F.lit("urn:g:"), F.col("src").cast("string"))).alias("st"),
            T.lit_term(T.Term.iri(TPCH + "next")).alias("pt"),
            T.iri_col(F.concat(F.lit("urn:g:"), F.col("dst").cast("string"))).alias("ot"),
        )
        store = TripleStore.from_term_structs(spark, trips)
        store = TripleStore(spark, store.df.localCheckpoint())
        _GRAPH_CACHE[key] = SparqlEngine(store)
    return _GRAPH_CACHE[key]


def _sel(engine: SparqlEngine, text: str, casts: dict) -> DataFrame:
    """Run a SELECT and project term structs to plain SQL columns.

    casts: output column -> (var, type) with type in
    {'lex','long','int','double','boolean'}.
    """
    res = engine.select(text)
    cols = [
        term_value(F.col(var), typ).alias(out) for out, (var, typ) in casts.items()
    ]
    return res.df.select(*cols)


# ------------------------------------------------------------------ queries


def q_sparql_bgp_join(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?r_name WHERE {{
          ?n a t:Nation ; t:name ?n_name ; t:region ?r .
          ?r t:name ?r_name .
        }}""",
        {"n_name": ("n_name", "lex"), "r_name": ("r_name", "lex")},
    )


def q_sparql_filter(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name ?bal WHERE {{
          ?c a t:Customer ; t:name ?c_name ; t:acctbal ?bal .
          FILTER(?bal > 7000)
        }}""",
        {"c_name": ("c_name", "lex"), "c_acctbal": ("bal", "double")},
    )


def q_sparql_agg_group(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name (COUNT(?c) AS ?num_cust) (MIN(?bal) AS ?min_bal)
               (MAX(?bal) AS ?max_bal)
        WHERE {{
          ?c a t:Customer ; t:nation ?n ; t:acctbal ?bal .
          ?n t:name ?n_name .
        }} GROUP BY ?n_name""",
        {
            "n_name": ("n_name", "lex"),
            "num_cust": ("num_cust", "long"),
            "min_bal": ("min_bal", "double"),
            "max_bal": ("max_bal", "double"),
        },
    )


def q_sparql_optional(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?c_name WHERE {{
          ?n a t:Nation ; t:name ?n_name .
          OPTIONAL {{
            ?c t:nation ?n ; t:name ?c_name ; t:acctbal ?bal .
            FILTER(?bal > 9900)
          }}
        }}""",
        {"n_name": ("n_name", "lex"), "c_name": ("c_name", "lex")},
    )


def q_sparql_union(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?name WHERE {{
          {{ ?c a t:Customer ; t:mktsegment "BUILDING" ; t:name ?name }}
          UNION
          {{ ?s a t:Supplier ; t:name ?name }}
        }}""",
        {"name": ("name", "lex")},
    )


def q_sparql_not_exists(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name WHERE {{
          ?c a t:Customer ; t:name ?c_name .
          FILTER NOT EXISTS {{
            ?o t:customer ?c ; t:totalprice ?tp . FILTER(?tp > 300000)
          }}
        }}""",
        {"c_name": ("c_name", "lex")},
    )


def q_sparql_path_seq(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name ?r_name WHERE {{
          ?c a t:Customer ; t:name ?c_name ; t:acctbal ?bal .
          ?c t:nation/t:region ?r .
          ?r t:name ?r_name .
          FILTER(?bal < -900)
        }}""",
        {"c_name": ("c_name", "lex"), "r_name": ("r_name", "lex")},
    )


def q_sparql_path_plus(spark, sf_dir):
    e = _ring_graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?x WHERE {{ <urn:g:0> t:next+ ?x }}""",
        {"node": ("x", "lex")},
    )


def q_sparql_values(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?r_name WHERE {{
          VALUES ?r_name {{ "ASIA" "EUROPE" }}
          ?r a t:Region ; t:name ?r_name .
          ?n t:region ?r ; t:name ?n_name .
        }}""",
        {"n_name": ("n_name", "lex"), "r_name": ("r_name", "lex")},
    )


def q_sparql_distinct(spark, sf_dir):
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT DISTINCT ?seg WHERE {{ ?c t:mktsegment ?seg }}""",
        {"c_mktsegment": ("seg", "lex")},
    )


# ------------------------------------------------- relational / pipeline


def _dsum(col, alias):
    """Exact decimal sum surfaced as double (bit-stable vs DuckDB)."""
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def q_pricing_summary(spark, sf_dir):
    l = _read(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    c = _read(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _read(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = _read(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15"))
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = l.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_local_suppliers(spark, sf_dir):
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _read(spark, sf_dir, "nation")
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
    )
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
    )
    return j.groupBy("n_name").agg(_dsum(revenue, "revenue"))


def q_events_hourly(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def q_window_top_order(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_dedup_exact(spark, sf_dir):
    from database_spark.pipeline import dedup  # noqa: F401  (module under test)

    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def q_text_stats(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length(F.col("text")).alias("len_chars"),
        (F.length(F.col("text")) - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", ""))).alias("n_punct"),
    )


def q_similarity_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(dot / (norm(F.col("v")) * norm(F.col("qv"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sparql_bgp_join": q_sparql_bgp_join,
    "sparql_filter": q_sparql_filter,
    "sparql_agg_group": q_sparql_agg_group,
    "sparql_optional": q_sparql_optional,
    "sparql_union": q_sparql_union,
    "sparql_not_exists": q_sparql_not_exists,
    "sparql_path_seq": q_sparql_path_seq,
    "sparql_path_plus": q_sparql_path_plus,
    "sparql_values": q_sparql_values,
    "sparql_distinct": q_sparql_distinct,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "local_suppliers": q_local_suppliers,
    "events_hourly": q_events_hourly,
    "window_top_order": q_window_top_order,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "similarity_topk": q_similarity_topk,
}


ORACLES: dict[str, str] = {
    "sparql_bgp_join": """
        SELECT n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "sparql_filter": """
        SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 7000
    """,
    "sparql_agg_group": """
        SELECT n_name, count(*) AS num_cust,
               min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sparql_optional": """
        SELECT n_name, c_name
        FROM nation LEFT JOIN
             (SELECT * FROM customer WHERE c_acctbal > 9900) c
             ON c.c_nationkey = nation.n_nationkey
    """,
    "sparql_union": """
        SELECT c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT s_name AS name FROM supplier
    """,
    "sparql_not_exists": """
        SELECT c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    "sparql_path_seq": """
        SELECT c_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_acctbal < -900
    """,
    "sparql_path_plus": """
        WITH RECURSIVE reach(n) AS (
          SELECT (0 + 5) % 16
          UNION
          SELECT (n + 5) % 16 FROM reach
        )
        SELECT 'urn:g:' || CAST(n AS VARCHAR) AS node FROM reach
    """,
    "sparql_values": """
        SELECT n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
    """,
    "sparql_distinct": """
        SELECT DISTINCT c_mktsegment FROM customer
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "local_suppliers": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               min(value) AS min_value, max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    "window_top_order": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn = 1
    """,
    "dedup_exact": """
        SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS keep_id
        FROM documents GROUP BY md5(text)
    """,
    "text_stats": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               length(text) AS len_chars,
               length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
        FROM documents
    """,
    "similarity_topk": """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), q AS (
          SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 3
        ), scored AS (
          SELECT query_id, vec_id AS neighbor_id,
                 round(list_dot_product(v, qv) /
                       (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
          FROM v CROSS JOIN q WHERE vec_id != query_id
        )
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored) WHERE rank <= 5
    """,
}


# ------------------------------------------------------------- driver API


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SPARQL aggregation over the rdfized sf0.001 graph —
    customers per region through the nation edge (BGP join + group)."""
    e = _graph(spark, "/root/testdata/sf0.001")
    res = e.select(
        f"""{PREFIX}
        SELECT ?r_name (COUNT(?c) AS ?num_cust) WHERE {{
          ?c a t:Customer ; t:nation ?n .
          ?n t:region ?r . ?r t:name ?r_name .
        }} GROUP BY ?r_name"""
    )
    return res.df.select(
        term_value(F.col("r_name"), "lex").alias("r_name"),
        term_value(F.col("num_cust"), "long").alias("num_cust"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
