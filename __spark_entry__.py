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


def _spread(df: DataFrame) -> DataFrame:
    """Use the whole cluster for per-row-heavy map work when the scan
    is NARROWER than it (shared guard — one definition so the
    condition can't drift between call sites)."""
    from database_spark.pipeline import spread_narrow

    return spread_narrow(df)


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
    "documents": RdfMapping(
        "doc_id",
        "urn:d:",
        {
            "text": TPCH + "text",
            "lang": TPCH + "lang",
            "source": TPCH + "source",
        },
        TPCH + "Document",
    ),
}


_STORE_LAYOUT_VERSION = 3  # bump when term encoding / bucketing changes (v3: + _o_index object layout)


def _tpch_fingerprint(sf_dir: str) -> str:
    """Source-data fingerprint (mtime+size of each mapped parquet) used
    to validate the on-disk bucketed store cache."""
    parts = [f"v{_STORE_LAYOUT_VERSION}"]
    for t in sorted(_MAPPINGS):
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:missing")
    return ";".join(parts)


def _swap_cache_dir(tmp: str, path: str) -> None:
    """Publish a freshly-built store cache dir with the smallest
    possible unavailability window (r11 advice #1): the old copy is
    RENAMED aside (an atomic metadata op, vs the unbounded rmtree the
    old code ran between delete and publish), the new copy renamed into
    place, and only then is the old copy deleted.  A crash between the
    two renames leaves ``path`` missing but ``tmp`` complete — the next
    process's fingerprint check fails on the missing dir and rebuilds;
    it can never observe a half-deleted store."""
    import shutil

    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _build_tpch_store(spark: SparkSession, sf_dir: str) -> TripleStore:
    parts = [
        rdfize(spark, _read(spark, sf_dir, t), _MAPPINGS[t]) for t in _MAPPINGS
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # dedupe=False: direct-mapping output is duplicate-free by
    # construction (one triple per table cell, per-table subject
    # prefixes) — skips a full (s,p,o,g) shuffle of the ingest
    return TripleStore.from_term_structs(spark, u, dedupe=False)


def _tpch_store(spark: SparkSession, sf_dir: str) -> TripleStore:
    """Load the rdfized graph from the predicate-bucketed parquet cache
    (ingest-once, query-many — the DataLoader/journal analog: Blazegraph
    also loads into its B+Tree store before serving queries).  Bound-
    predicate patterns then prune to one p_bucket directory at scan time
    instead of re-deriving the graph per session.  Falls back to an
    in-session build + localCheckpoint when the cache dir is unusable."""
    cache_root = os.environ.get("SPARK_GRAFT_STORE_CACHE", "/tmp/spark_graft_store")
    slug = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(cache_root, slug)
    fp = _tpch_fingerprint(sf_dir)
    try:
        if os.path.isdir(path):
            meta = TripleStore._read_meta(spark, path)
            if meta.get("fingerprint") == fp:
                return TripleStore.load(spark, path)
    except Exception:  # noqa: BLE001 — stale/corrupt cache: rebuild below
        pass
    store = _build_tpch_store(spark, sf_dir)
    try:
        import shutil

        tmp = path + ".build"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        store.save(
            tmp,
            partition_by_predicate=True,
            buckets=64,
            extra_meta={"fingerprint": fp},
        )
        _swap_cache_dir(tmp, path)
        return TripleStore.load(spark, path)
    except Exception:  # noqa: BLE001 — read-only cache root etc.
        from database_spark.operators import lifecycle as L

        return TripleStore(
            spark,
            L.protected_checkpoint(store.df),
            has_named=store.has_named,
        )


def _graph(spark: SparkSession, sf_dir: str) -> SparqlEngine:
    """One TripleStore per sf_dir: on-disk bucketed cache via
    ``_tpch_store`` (patterns prune by predicate, so the merged graph
    costs queries nothing while the ingest cost amortizes across every
    session that touches this sf_dir)."""
    key = (sf_dir, "__tpch__")
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = SparqlEngine(_tpch_store(spark, sf_dir))
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
        from database_spark.operators import lifecycle as L

        store = TripleStore.from_term_structs(spark, trips, dedupe=False)
        store = TripleStore(
            spark, L.protected_checkpoint(store.df), has_named=False
        )
        _GRAPH_CACHE[key] = SparqlEngine(store)
    return _GRAPH_CACHE[key]


_QUADS_LAYOUT_VERSION = 1


def _quads_graph(spark: SparkSession, sf_dir: str) -> SparqlEngine:
    """Named-graph (quads) store: every customer's statements live in
    the named graph of its nation — ``GRAPH urn:gn:<nationkey> {
    urn:c:<custkey> t:name …, t:mktsegment … }`` — the Wikidata-style
    named-graph-heavy single-namespace shape.  Saved with the full
    layout family, so a GRAPH-bound scan reads the context-keyed
    ``_g_index`` copy (the CSPO quad permutation,
    ``SPOKeyOrder.java:101-105,113-128``) and prunes to one g_bucket
    directory instead of full-scanning with g as a residual filter."""
    key = (sf_dir, "__quads__")
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    cache_root = os.environ.get("SPARK_GRAFT_STORE_CACHE", "/tmp/spark_graft_store")
    slug = sf_dir.strip("/").replace("/", "_") + "__quads"
    path = os.path.join(cache_root, slug)
    try:
        cst = os.stat(os.path.join(sf_dir, "customer.parquet"))
        fp = f"v{_QUADS_LAYOUT_VERSION};customer:{cst.st_mtime_ns}:{cst.st_size}"
    except OSError:
        fp = f"v{_QUADS_LAYOUT_VERSION};customer:missing"
    try:
        if os.path.isdir(path):
            meta = TripleStore._read_meta(spark, path)
            if meta.get("fingerprint") == fp:
                _GRAPH_CACHE[key] = SparqlEngine(TripleStore.load(spark, path))
                return _GRAPH_CACHE[key]
    except Exception:  # noqa: BLE001 — stale/corrupt cache: rebuild below
        pass
    c = _read(spark, sf_dir, "customer")
    pairs = F.array(
        F.struct(
            T.lit_term(T.Term.iri(TPCH + "name")).alias("pt"),
            T.literal_col(F.col("c_name"), T.XSD_STRING).alias("ot"),
        ),
        F.struct(
            T.lit_term(T.Term.iri(TPCH + "mktsegment")).alias("pt"),
            T.literal_col(F.col("c_mktsegment"), T.XSD_STRING).alias("ot"),
        ),
    )
    quads = c.select(
        T.iri_col(
            F.concat(F.lit("urn:c:"), F.col("c_custkey").cast("string"))
        ).alias("st"),
        F.explode(pairs).alias("po"),
        T.iri_col(
            F.concat(F.lit("urn:gn:"), F.col("c_nationkey").cast("string"))
        ).alias("gt"),
    ).select("st", F.col("po.pt").alias("pt"), F.col("po.ot").alias("ot"), "gt")
    store = TripleStore.from_term_structs(spark, quads, dedupe=False)
    store.has_named = True  # every statement is named, by construction
    try:
        import shutil

        tmp = path + ".build"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        store.save(
            tmp,
            partition_by_predicate=True,
            buckets=64,
            extra_meta={"fingerprint": fp},
        )
        _swap_cache_dir(tmp, path)
        _GRAPH_CACHE[key] = SparqlEngine(TripleStore.load(spark, path))
    except Exception:  # noqa: BLE001 — read-only cache root etc.
        from database_spark.operators import lifecycle as L

        _GRAPH_CACHE[key] = SparqlEngine(
            TripleStore(
                spark, L.protected_checkpoint(store.df), has_named=True
            )
        )
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
            ?c a t:Customer ; t:nation ?n ; t:name ?c_name ; t:acctbal ?bal .
            FILTER(?bal > 9900)
          }}
        }}""",
        {"n_name": ("n_name", "lex"), "c_name": ("c_name", "lex")},
    )


def q_sparql_optional_rejoin(spark, sf_dir):
    """Re-join a variable left NULLABLE by OPTIONAL (VERDICT r4 #1):
    after the OPTIONAL, ?c is maybe-unbound; the orders pattern then
    re-joins it, and SPARQL compatibility says an unbound ?c matches
    every order.  The compiler decomposes this into a union of
    disjoint equi-join branches (compiler._compat_join_union) so the
    dominant bound×bound branch HASH-joins on the term id — the naive
    isNull|isNull|eq condition would be a BroadcastNestedLoopJoin that
    dies once both sides outgrow the broadcast threshold.  Reference
    semantics: JVMHashJoinUtility (hash on the bound subset)."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name (COUNT(?o) AS ?n_ord) (MIN(?price) AS ?min_price)
        WHERE {{
          ?n a t:Nation ; t:name ?n_name .
          OPTIONAL {{ ?c a t:Customer ; t:nation ?n ; t:acctbal ?bal .
                      FILTER(?bal > 9990) }}
          ?o t:customer ?c ; t:totalprice ?price .
        }} GROUP BY ?n_name""",
        {
            "n_name": ("n_name", "lex"),
            "n_ord": ("n_ord", "long"),
            "min_price": ("min_price", "double"),
        },
    )


def q_sparql_outer_union(spark, sf_dir):
    """left_outer with a RIGHT-nullable shared var (r4 verdict #2
    closing sweep): the OPTIONAL's group is a UNION whose second branch
    does not bind ?n, so ?n reaches the left join maybe-unbound on the
    RIGHT side.  Splitting the right side per-branch would corrupt the
    unmatched-row extension, so the compiler goes through
    ``_compat_left_outer_via_inner``: the inner compatibility join as a
    union of disjoint EQUI branches, plus unmatched left rows recovered
    with a null-safe-equi anti join — every join hash-partitionable.
    The naive encoding (isNull|eq OR-condition left join) is a
    BroadcastNestedLoopJoin that dies at scale.  Reference semantics:
    JVMHashJoinUtility optional-join path."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?who ?val WHERE {{
          ?n a t:Nation ; t:name ?n_name .
          OPTIONAL {{
            {{ ?c a t:Customer ; t:nation ?n ; t:name ?who ; t:acctbal ?val .
               FILTER(?val > 9985) }}
            UNION
            {{ ?s a t:Supplier ; t:name ?who ; t:acctbal ?val .
               FILTER(?val > 9950) }}
          }}
        }}""",
        {
            "n_name": ("n_name", "lex"),
            "who": ("who", "lex"),
            "val": ("val", "double"),
        },
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


def q_sparql_minus(spark, sf_dir):
    """MINUS with a shared variable (compiler.py MINUS shared-var rule;
    reference: AST2BOp minus → JVMSolutionSetHashJoinOp anti-join)."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name WHERE {{
          ?c a t:Customer ; t:name ?c_name .
          MINUS {{ ?c t:nation <urn:n:5> }}
        }}""",
        {"c_name": ("c_name", "lex")},
    )


def q_sparql_minus_nullable(spark, sf_dir):
    """MINUS over a shared var left MAYBE-UNBOUND by an OPTIONAL (r5
    verdict #1): ?s_name is nullable on the left, so the old plan was
    an OR-condition ``(isNull|isNull|eq) & overlap`` anti join — a
    BroadcastNestedLoopJoin once the deduplicated right side outgrows
    the broadcast threshold.  The compiler now decomposes the pair
    space by null pattern into chained EQUI anti-join branches
    (branches with no bound-both-sides var are pruned by the MINUS
    overlap rule), so every join hash-partitions.  Unbound ?s_name
    rows survive (disjoint domains keep the row); bound rows are
    removed when a >9990-acctbal supplier shares the name.  Reference:
    JVMHashJoinUtility filterSolutions/MINUS path."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name ?s_name WHERE {{
          ?c a t:Customer ; t:nation ?n ; t:name ?c_name ; t:acctbal ?bal .
          FILTER(?bal > 9000)
          OPTIONAL {{ ?s a t:Supplier ; t:nation ?n ; t:name ?s_name ;
                      t:acctbal ?sb . FILTER(?sb > 9900) }}
          MINUS {{ ?s2 a t:Supplier ; t:name ?s_name ; t:acctbal ?sb2 .
                   FILTER(?sb2 > 9990) }}
        }}""",
        {"c_name": ("c_name", "lex"), "s_name": ("s_name", "lex")},
    )


def q_sparql_exists(spark, sf_dir):
    """Positive FILTER EXISTS → left-semi join."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name WHERE {{
          ?c a t:Customer ; t:name ?c_name .
          FILTER EXISTS {{
            ?o t:customer ?c ; t:totalprice ?tp . FILTER(?tp > 300000)
          }}
        }}""",
        {"c_name": ("c_name", "lex")},
    )


def q_sparql_path_zero(spark, sf_dir):
    """Zero-or-one path `?` (ZeroLengthPathOp): each nation reaches
    itself (length 0) and its region (length 1)."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?x WHERE {{
          ?n a t:Nation ; t:name ?n_name .
          ?n t:region? ?x .
        }}""",
        {"n_name": ("n_name", "lex"), "x": ("x", "lex")},
    )


def q_sparql_nps(spark, sf_dir):
    """Negated property set !(p1|p2): everything a nation states except
    its name and type — leaves exactly the region edge."""
    e = _graph(spark, sf_dir)
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?s ?o WHERE {{
          ?s a t:Nation .
          ?s !(t:name|<{rdf_type}>) ?o .
        }}""",
        {"s": ("s", "lex"), "o": ("o", "lex")},
    )


def q_sparql_ref_lookup(spark, sf_dir):
    """Reverse lookup ``?s ?p <const>`` (bound object, unbound
    predicate AND subject): everything referencing nation urn:n:7.
    Reads the object-keyed layout (``_o_index``, the OSP-permutation
    analog — ``SPOKeyOrder.java:90-128`` picks OSP for bound-o
    patterns): one ``o_bucket`` directory + (o,p,s)-sorted row groups
    instead of a full scan of all 64 predicate buckets."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?s ?p WHERE {{ ?s ?p <urn:n:7> }}""",
        {"s": ("s", "lex"), "p": ("p", "lex")},
    )


def q_sparql_graph_scan(spark, sf_dir):
    """GRAPH-bound quad scan ``GRAPH <g> { ?s ?p ?o }`` — only the
    context is bound, so neither the p- nor the s-/o-layout can prune.
    Reads the context-keyed layout (``_g_index``, the CSPO
    quad-permutation analog — ``SPOKeyOrder.java:101-105,113-128``
    makes context a prefix scan): one ``g_bucket`` directory +
    (g,s,p,o)-sorted row groups instead of a full scan of all 64
    predicate buckets with g as a residual filter."""
    e = _quads_graph(spark, sf_dir)
    return _sel(
        e,
        "SELECT ?s ?p ?o WHERE { GRAPH <urn:gn:7> { ?s ?p ?o } }",
        {"s": ("s", "lex"), "p": ("p", "lex"), "o": ("o", "lex")},
    )


def q_sparql_graph_pred_scan(spark, sf_dir):
    """Both-bound quad scan ``GRAPH <g> { ?s <p> ?o }`` — predicate AND
    context bound, the composite-prefix shape (r11 verdict missing #2).
    The compiler compares the two candidate pruned partitions' row
    counts (memoized metadata-counts — the ``SPOAccessPath`` range-count
    comparison) and routes through the context-keyed ``_g_index`` here:
    on this graph-heavy store one ``g_bucket`` directory (~1/25 of the
    named rows) beats the ``p_bucket`` directory (~1/2 of them) by an
    order of magnitude (``PROBE_PG.json``: 25.3x vs 2.0x scan waste at
    sf1).  No fifth composite layout needed — routing recovers the gap
    (decision record: COVERAGE.md round-12)."""
    e = _quads_graph(spark, sf_dir)
    return _sel(
        e,
        "SELECT ?s ?o WHERE { GRAPH <urn:gn:3> "
        "{ ?s <urn:tpch:mktsegment> ?o } }",
        {"s": ("s", "lex"), "o": ("o", "lex")},
    )


def q_sparql_reduced(spark, sf_dir):
    """SELECT REDUCED (we fully dedupe — a permitted REDUCED answer,
    and the only deterministic one)."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT REDUCED ?seg WHERE {{ ?c a t:Customer ; t:mktsegment ?seg }}""",
        {"seg": ("seg", "lex")},
    )


def q_sparql_federation(spark, sf_dir):
    """SERVICE <http://…> federation through the vectored remote
    handler (federation.py; reference ServiceCallJoin) with a hermetic
    in-process endpoint — the HTTP fetcher is injectable, so the gate
    exercises the render→fetch→parse→join path without a network."""
    from database_spark.sparql.federation import make_remote_service

    codes = [
        ("AFRICA", "af"), ("AMERICA", "am"), ("ASIA", "as"),
        ("EUROPE", "eu"), ("MIDDLE EAST", "me"),
    ]

    def fake_fetcher(endpoint, query):
        return {
            "head": {"vars": ["rn", "code"]},
            "results": {
                "bindings": [
                    {
                        "rn": {"type": "literal", "value": k},
                        "code": {"type": "literal", "value": v},
                    }
                    for k, v in codes
                ]
            },
        }

    key = (sf_dir, "__fed__")
    if key not in _GRAPH_CACHE:
        # share the cached TPC-H store (and its settled has_named /
        # default-graph state) — only the service registry differs
        store = _graph(spark, sf_dir).store
        _GRAPH_CACHE[key] = SparqlEngine(
            store, services=make_remote_service(fake_fetcher)
        )
    e = _GRAPH_CACHE[key]
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?n_name ?code WHERE {{
          ?n a t:Nation ; t:name ?n_name ; t:region ?r .
          ?r t:name ?rn .
          SERVICE <http://example.org/sparql> {{ ?rn <urn:x:code> ?code }}
        }}""",
        {"n_name": ("n_name", "lex"), "code": ("code", "lex")},
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


def _geo_graph(spark: SparkSession, sf_dir: str) -> SparqlEngine:
    """Point-per-user graph with deterministic integer lat/lon derived
    from event user ids (oracle can reproduce the arithmetic)."""
    key = (sf_dir, "__geo__")
    if key not in _GRAPH_CACHE:
        from database_spark.search.geospatial import LATLON_DT

        ev = _read(spark, sf_dir, "events")
        pts = ev.select("user_id").dropDuplicates().select(
            F.col("user_id"),
            (((F.col("user_id") * 37) % 180) - 90).alias("lat"),
            (((F.col("user_id") * 73) % 360) - 180).alias("lon"),
        )
        trips = pts.select(
            T.iri_col(F.concat(F.lit("urn:u:"), F.col("user_id").cast("string"))).alias("st"),
            T.lit_term(T.Term.iri(TPCH + "loc")).alias("pt"),
            T.term_struct(
                F.lit(T.KIND_LITERAL),
                F.concat(F.col("lat").cast("string"), F.lit("#"), F.col("lon").cast("string")),
                F.lit(LATLON_DT),
                F.lit(None),
            ).alias("ot"),
        )
        from database_spark.operators import lifecycle as L

        store = TripleStore.from_term_structs(spark, trips, dedupe=False)
        _GRAPH_CACHE[key] = SparqlEngine(
            TripleStore(spark, L.protected_checkpoint(store.df), has_named=False)
        )
    return _GRAPH_CACHE[key]


def q_sparql_fts(spark, sf_dir):
    """bds:search full-text service over document literals.

    Relevance is the reference's exact cosine (tf-normalized vectors,
    byte315-quantized doc weights — FullTextIndexTupleSerializer.java:
    138, ReadIndexTask.java:162-189); rounded to 9 decimals on both
    sides so the FP sum order across matched tokens can't flip the
    value hash.
    """
    e = _graph(spark, sf_dir)
    df = _sel(
        e,
        f"""{PREFIX}
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?d ?score WHERE {{
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search "spark query join" ; bds:relevance ?score .
          }}
          ?d a t:Document ; t:text ?lit .
        }}""",
        {"doc": ("d", "lex"), "relevance": ("score", "double")},
    )
    return df.withColumn("relevance", F.round(F.col("relevance"), 9))


def q_sparql_geo_rect(spark, sf_dir):
    """geo:search inRectangle over z-order point literals."""
    e = _geo_graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        SELECT ?s WHERE {{
          SERVICE <http://www.bigdata.com/rdf/geospatial#search> {{
            ?s geo:search "inRectangle" ;
               geo:predicate t:loc ;
               geo:spatialRectangleSouthWest "-45#-90" ;
               geo:spatialRectangleNorthEast "45#90" .
          }}
        }}""",
        {"node": ("s", "lex")},
    )


def q_rdfs_closure_types(spark, sf_dir):
    """RDFS closure: segment classes subClassOf Customer; rdfs9 infers
    the supertype for every instance."""
    from database_spark.inference.rdfs import SUBCLASS, rdfs_closure

    key = (sf_dir, "__closure__")
    if key not in _GRAPH_CACHE:
        c = _read(spark, sf_dir, "customer")
        inst = c.select(
            T.iri_col(F.concat(F.lit("urn:cc:"), F.col("c_custkey").cast("string"))).alias("st"),
            T.lit_term(T.Term.iri(T.RDF + "type")).alias("pt"),
            T.iri_col(F.concat(F.lit("urn:seg:"), F.col("c_mktsegment"))).alias("ot"),
        )
        onto = c.select("c_mktsegment").dropDuplicates().select(
            T.iri_col(F.concat(F.lit("urn:seg:"), F.col("c_mktsegment"))).alias("st"),
            T.lit_term(SUBCLASS).alias("pt"),
            T.lit_term(T.Term.iri(TPCH + "Customer")).alias("ot"),
        )
        from database_spark.operators import lifecycle as L

        store = TripleStore.from_term_structs(
            spark, inst.unionByName(onto), dedupe=False
        )
        closed = rdfs_closure(store)
        _GRAPH_CACHE[key] = SparqlEngine(
            TripleStore(spark, L.protected_checkpoint(closed.df), has_named=False)
        )
    e = _GRAPH_CACHE[key]
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?cls (COUNT(?s) AS ?n) WHERE {{ ?s a ?cls }} GROUP BY ?cls""",
        {"cls": ("cls", "lex"), "n": ("n", "long")},
    )


def q_gas_bfs_depth(spark, sf_dir):
    """BFS via the gas: SERVICE on the 16-node ring (+5 mod 16):
    depth(x) == 13*x mod 16 (13 = 5^-1 mod 16)."""
    e = _ring_graph(spark, sf_dir)
    return _sel(
        e,
        """PREFIX gas: <http://www.bigdata.com/rdf/gas#>
        SELECT ?node ?depth WHERE {
          SERVICE <http://www.bigdata.com/rdf/gas#service> {
            gas:program gas:gasClass "BFS" ;
                        gas:in <urn:g:0> ;
                        gas:out ?node ;
                        gas:out1 ?depth .
          }
        }""",
        {"node": ("node", "lex"), "depth": ("depth", "long")},
    )


def _ring_edges(spark, sf_dir, step: int):
    """Derived 16-node edge frame; the full-events scan + dedupe is
    paid once per (sf, step) and the 16-row result is checkpointed —
    re-deriving it per GAS query was ~1.5s of pure rescan."""
    key = (sf_dir, "__ring_edges__", step)
    if key not in _GRAPH_CACHE:
        from database_spark.operators import lifecycle as L

        ev = _read(spark, sf_dir, "events")
        edges = (
            ev.select((F.col("user_id") % 16).alias("src"))
            .withColumn("dst", (F.col("src") + step) % 16)
            .dropDuplicates(["src", "dst"])
            .coalesce(1)
        )
        _GRAPH_CACHE[key] = L.protect(L.checkpoint(edges))
    return _GRAPH_CACHE[key]


def q_gas_cc(spark, sf_dir):
    """Connected components of u -> (u+2) mod 16: evens and odds.
    Component re-labeled by its minimum numeric member for determinism."""
    from database_spark.operators.graph import connected_components

    comps = connected_components(
        _ring_edges(spark, sf_dir, 2).select("src", "dst")
    )
    return (
        comps.groupBy("component")
        .agg(F.min("node").alias("comp"), F.count(F.lit(1)).alias("n_nodes"))
        .select("comp", "n_nodes")
    )


def q_gas_sssp(spark, sf_dir):
    """Weighted SSSP on the unit-weight 16-ring: dist == BFS depth."""
    from database_spark.operators.graph import sssp

    edges = _ring_edges(spark, sf_dir, 5).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return sssp(edges, seeds).select(
        F.concat(F.lit("urn:g:"), F.col("node").cast("string")).alias("node"),
        F.col("dist"),
    )


def q_fast_count(spark, sf_dir):
    """COUNT(*) by table — FastRangeCountOp analog: via the V2 parquet
    reader the COUNT is pushed into the scan (PushedAggregation:
    [COUNT(*)] in the plan) and answered from row-group metadata, the
    Spark equivalent of the reference's two-key-probe range count."""
    # isolated child session (shared context, own SQLConf): flipping to
    # the V2 reader must not leak into concurrently-running queries.
    # Cached — newSession() per call cost ~3x on this 1.3s query (r2)
    key = (id(spark), "__v2session__")
    if key not in _GRAPH_CACHE:
        s2 = spark.newSession()
        s2.conf.set("spark.sql.sources.useV1SourceList", "")
        _GRAPH_CACHE[key] = s2
    s2 = _GRAPH_CACHE[key]
    l = s2.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = s2.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        l.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitem").alias("tbl"), "n")
        .unionByName(
            o.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("orders").alias("tbl"), "n")
        )
    )


def q_gas_cc_derived(spark, sf_dir):
    """Connected components on a non-trivial 150-node functional graph
    u -> (7u+3) mod 150; oracle = recursive-CTE undirected closure with
    min-label per node."""
    from database_spark.operators.graph import connected_components

    ev = _read(spark, sf_dir, "events")
    edges = (
        ev.select((F.col("user_id") % 150).alias("src"))
        .withColumn("dst", (F.col("src") * 7 + 3) % 150)
        .dropDuplicates(["src", "dst"])
    )
    return connected_components(edges).select("node", "component")


def q_gas_pagerank(spark, sf_dir):
    """PageRank on the 1-regular 16-cycle: every rank is exactly 1.0
    ((1-d) + d*1.0 == 1.0 in IEEE), so the oracle is exact."""
    from database_spark.operators.graph import pagerank

    ranks = pagerank(_ring_edges(spark, sf_dir, 5), iters=5)
    return ranks.select(
        F.concat(F.lit("urn:g:"), F.col("node").cast("string")).alias("node"),
        F.col("rank"),
    )


def _large_graph_edges(spark, sf_dir, kind: str):
    """>512-edge deterministic graphs derived from events.event_id so
    the GAS gates exercise the DISTRIBUTED frontier loops: the ≤512-
    edge probe in operators/graph.py collapses smaller graphs to the
    driver-local path, which had left the scale path result-unverified
    (VERDICT r3 #1).  Doubling-style edge sets keep the diameter small
    (≤ ~11 rounds) so the iterative joins stay bench-cheap."""
    key = (sf_dir, "__large_graph__", kind)
    if key not in _GRAPH_CACHE:
        from database_spark.operators import lifecycle as L

        ev = _read(spark, sf_dir, "events").select(
            (F.col("event_id") % 2000).alias("src")
        )
        if kind == "bfs":
            # u -> (4u+r) % 2000, r in 0..3: 8000 edges, diameter 6
            e = ev.withColumn(
                "r", F.explode(F.array(*[F.lit(i) for i in range(4)]))
            ).select("src", ((F.col("src") * 4 + F.col("r")) % 2000).alias("dst"))
        elif kind == "cc":
            # parity-preserving doubling (4000 edges): two components
            # (even/odd), each a diameter-~10 doubling graph, so min-
            # label propagation genuinely runs multi-round
            i = F.floor(F.col("src") / 2)
            c = F.col("src") % 2
            e = ev.withColumn("r", F.explode(F.array(F.lit(0), F.lit(1)))).select(
                "src", (((i * 2 + F.col("r")) % 1000) * 2 + c).alias("dst")
            )
        else:
            # permutation ring u -> (u+7) % 2000: 1-regular in AND out,
            # so every PageRank is exactly 1.0 at every iteration
            e = ev.select("src", ((F.col("src") + 7) % 2000).alias("dst"))
        _GRAPH_CACHE[key] = L.protect(
            L.checkpoint(e.select(F.col("src").cast("long"), F.col("dst").cast("long")).dropDuplicates())
        )
    return _GRAPH_CACHE[key]


def q_gas_bfs_large(spark, sf_dir):
    """Distributed-path BFS over the 8000-edge base-4 doubling graph;
    oracle = recursive-CTE min-depth (TestBFS.java parity at scale)."""
    from database_spark.operators.graph import bfs

    e = _large_graph_edges(spark, sf_dir, "bfs")
    seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return bfs(e, seeds).select("node", F.col("depth").cast("long").alias("depth"))


def q_gas_sssp_large(spark, sf_dir):
    """Distributed-path weighted SSSP on the doubling graph with
    src-derived weights 1|2|3 — exercises the frontier Bellman-Ford's
    min-aggregation over genuinely unequal path costs."""
    from database_spark.operators.graph import sssp

    e = _large_graph_edges(spark, sf_dir, "bfs").select(
        "src",
        "dst",
        (F.lit(1.0) + (F.col("src") % 3).cast("double")).alias("weight"),
    )
    seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return sssp(e, seeds).select("node", "dist")


def q_gas_cc_large(spark, sf_dir):
    """Distributed-path connected components: two 1000-node components
    whose min labels (0 and 1) take ~11 propagation rounds to reach
    every member."""
    from database_spark.operators.graph import connected_components

    e = _large_graph_edges(spark, sf_dir, "cc")
    return connected_components(e).select("node", "component")


def q_gas_pagerank_large(spark, sf_dir):
    """Distributed-path PageRank on the 2000-edge permutation ring:
    1-regular in/out degree keeps every rank exactly 1.0 (IEEE-exact,
    (1-d) + d*1.0 == 1.0 by Sterbenz), so the oracle is exact."""
    from database_spark.operators.graph import pagerank

    return pagerank(_large_graph_edges(spark, sf_dir, "pr"), iters=5).select(
        "node", "rank"
    )


def q_gas_fuzzy_band(spark, sf_dir):
    """FuzzySSSP (bigdata-gas FuzzySSSP.java) through the DISTRIBUTED
    loops: forward + reverse SSSP over the 8000-edge doubling graph,
    on-path test, BFS band cut at the end of the layer reaching N.
    Oracle: three recursive CTEs (fwd dist, rev dist, band) + a
    windowed cumulative layer cut."""
    from database_spark.operators.graph import fuzzy_sssp

    e = _large_graph_edges(spark, sf_dir, "bfs")
    return fuzzy_sssp(e, [0], [1234], n=600).select(
        "node", F.col("depth").cast("long").alias("depth")
    )


def q_stream_hourly(spark, sf_dir):
    """The hourly rollup through REAL Structured Streaming (availableNow
    over a staged copy of events, memory sink) — must equal the static
    oracle."""
    import tempfile

    from database_spark.streaming.windows import (
        hourly_event_stats,
        run_available_now,
        source_partitions,
    )

    # Stage the source copy ONCE per sf_dir (VERDICT r4 #3): the copy
    # plus availableNow machinery was ~5 s of pure setup re-paid on
    # every call while exec was 0.14 s.  The checkpoint dir must stay
    # per-call (a reused checkpoint makes availableNow a no-op and the
    # memory sink would come back empty).
    skey = (sf_dir, "__stream_stage__")
    if skey not in _GRAPH_CACHE:
        stage = tempfile.mkdtemp(prefix="dbspark-bench-stream-")
        _read(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").parquet(
            stage + "/events"
        )
        # state/shuffle partition count for the drain, derived from the
        # staged source's scan splits (guide §2: scale-adaptive, never
        # a core-count constant) — memoized with the stage
        _GRAPH_CACHE[skey] = (stage, source_partitions(spark, stage + "/events"))
    stage, parts = _GRAPH_CACHE[skey]
    cp = tempfile.mkdtemp(prefix="dbspark-stream-cp-")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(stage + "/events")
    name = "q_stream_hourly"
    q = run_available_now(hourly_event_stats(stream), name, cp, partitions=parts)
    q.stop()
    return spark.table(name)


def q_stream_dedup(spark, sf_dir):
    """Streaming ingest dedup through REAL Structured Streaming:
    events staged TWICE (every row a duplicate), availableNow drain
    through watermarked ``dropDuplicatesWithinWatermark`` — output must
    equal the distinct static relation.  State is watermark-bounded
    (see ``streaming.windows.dedup_stream``)."""
    import tempfile

    from database_spark.streaming.windows import (
        dedup_stream,
        run_available_now,
        source_partitions,
    )

    skey = (sf_dir, "__stream_dup_stage__")
    if skey not in _GRAPH_CACHE:
        stage = tempfile.mkdtemp(prefix="dbspark-bench-sdup-")
        ev = _read(spark, sf_dir, "events")
        ev.unionByName(ev).coalesce(4).write.mode("overwrite").parquet(
            stage + "/events"
        )
        _GRAPH_CACHE[skey] = (stage, source_partitions(spark, stage + "/events"))
    stage, parts = _GRAPH_CACHE[skey]
    cp = tempfile.mkdtemp(prefix="dbspark-sdup-cp-")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(stage + "/events")
    out = dedup_stream(stream, ["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    name = "q_stream_dedup"
    q = run_available_now(out, name, cp, partitions=parts)
    q.stop()
    return spark.table(name)


def q_stream_sessions(spark, sf_dir):
    """session_window sessionization per user (30 min gap)."""
    from database_spark.streaming.windows import sessionize

    ev = _read(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes").select(
        "user_id", "session_start", "n_events", "total_value"
    )


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs, exact-verified: LSH generates the
    candidates (banded signature join, never all-pairs), then each
    candidate's exact shingle Jaccard is computed and thresholded.

    The final answer is therefore a set-semantic quantity — "pairs with
    trigram Jaccard ≥ 0.5" — which the DuckDB oracle computes
    quadratically.  bands = num_hashes (r=1) makes candidate recall
    effectively exact (a ≥0.5-similar pair escapes all 24 bands with
    probability ≤ 0.5^24 ≈ 6e-8); production defaults keep r=4 where a
    tiny recall loss buys a much smaller candidate join."""
    from database_spark.pipeline import dedup

    d = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=24, bands=24, threshold=0.5
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING end-to-end: LSH pairs → connected components
    → canonical representative (longest text, smallest-id tiebreak).
    The oracle replays it with quadratic pairs + a recursive-CTE
    closure + a window-ranked representative."""
    from database_spark.pipeline import dedup

    d = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return dedup.near_dup_clusters(
        d, "doc_id", "text", num_hashes=24, bands=24, threshold=0.5
    ).select(F.col("id").alias("doc_id"), "cluster", "keep")


def q_graph_bulk_degree(spark, sf_dir):
    """Blueprints veneer end-to-end at sf: nations + customers bulk-
    loaded as vertices and customer→nation links as edges (column-wise
    statement frames, one distributed engine commit per load —
    BigdataGraphBulkLoad analog), then per-nation membership degree
    read back from the relational edge view.  The property-graph state
    IS RDF statements, so the oracle is a plain GROUP BY on the source
    table."""
    key = (sf_dir, "__blueprints__")
    if key not in _GRAPH_CACHE:
        from database_spark.blueprints import PropertyGraph
        from database_spark.operators import lifecycle as L
        from database_spark.sparql.engine import SparqlEngine as Eng

        g = PropertyGraph(Eng(TripleStore.from_python_triples(spark, [])))
        cust = _read(spark, sf_dir, "customer")
        nat = _read(spark, sf_dir, "nation")
        g.bulk_load_vertices(
            nat.select(
                F.col("n_nationkey").cast("string").alias("id"),
                F.col("n_name").alias("name"),
            )
        )
        g.bulk_load_vertices(
            cust.select(
                F.concat(F.lit("c"), F.col("c_custkey")).alias("id"),
                F.col("c_acctbal").alias("acctbal"),
            )
        )
        g.bulk_load_edges(
            cust.select(
                F.concat(F.lit("e"), F.col("c_custkey")).alias("id"),
                F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
                F.col("c_nationkey").cast("string").alias("dst"),
            ),
            label="in_nation",
        )
        g.engine.store = TripleStore(
            spark, L.protected_checkpoint(g.engine.store.df), has_named=False
        )
        _GRAPH_CACHE[key] = g
    g = _GRAPH_CACHE[key]
    return (
        g.edges_df()
        .groupBy("in")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("in").alias("nation_id"), "n_members")
    )


def q_update_roundtrip(spark, sf_dir):
    """SPARQL UPDATE verbs end-to-end: INSERT DATA, DELETE/INSERT
    WHERE, then a grouped count.  The oracle replays the same sequence
    as a DuckDB CTE chain (each update = one derived relation)."""
    from database_spark.sparql.engine import SparqlEngine as Eng

    store = TripleStore.from_python_triples(
        spark,
        [
            (T.Term.iri("urn:a"), T.Term.iri("urn:p"), T.Term.integer(1)),
            (T.Term.iri("urn:b"), T.Term.iri("urn:p"), T.Term.integer(2)),
        ],
    )
    eng = Eng(store)
    eng.update('INSERT DATA { <urn:c> <urn:p> 3 . <urn:d> <urn:q> 4 . }')
    eng.update(
        'DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p2> ?o } '
        'WHERE { ?s <urn:p> ?o . FILTER(?o >= 2) }'
    )
    res = eng.select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p"
    )
    return res.df.select(
        term_value(F.col("p"), "lex").alias("p"),
        term_value(F.col("n"), "long").alias("n"),
    )


def q_changeset_delta(spark, sf_dir):
    """Changesets API through the oracle gate (IChangeLog semantics):
    subscribe a listener, run one DELETE/INSERT commit over the
    rdfized region table, and return the exact per-commit delta the
    listener received — added flag triples and removed name triples
    for the A-regions — as relational rows the DuckDB oracle rebuilds
    from the base table."""
    store = TripleStore.from_term_structs(
        spark, rdfize(spark, _read(spark, sf_dir, "region"), _MAPPINGS["region"]),
        dedupe=False,
    )
    e = SparqlEngine(store)
    got: dict = {}
    e.add_change_listener(lambda cs: got.update(a=cs.added, r=cs.removed))
    e.update(
        f"""{PREFIX}
        DELETE {{ ?s t:name ?n }}
        INSERT {{ ?s t:flag "x" }}
        WHERE {{ ?s t:name ?n . FILTER(STRSTARTS(?n, "A")) }}"""
    )

    def flat(df, kind):
        return df.select(
            F.lit(kind).alias("change"),
            F.col("st").getField("lex").alias("s"),
            F.col("pt").getField("lex").alias("p"),
            F.col("ot").getField("lex").alias("o"),
        )

    return flat(got["a"], "added").unionByName(flat(got["r"], "removed"))


def q_sparql_ask(spark, sf_dir):
    """ASK form, surfaced as a 1-row boolean DataFrame."""
    e = _graph(spark, sf_dir)
    yes = e.ask(f"{PREFIX} ASK {{ ?c a t:Customer ; t:acctbal ?b . FILTER(?b > 9990) }}")
    no = e.ask(f"{PREFIX} ASK {{ ?c a t:Customer ; t:acctbal ?b . FILTER(?b > 99999) }}")
    # pure-JVM VALUES relation — createDataFrame over a Python list
    # routes through the Python-RDD path and spawns the whole Python
    # worker pool just to ship 2 rows (graph.py's documented rule)
    return spark.sql(
        "SELECT probe, CAST(ask AS BOOLEAN) AS ask FROM VALUES "
        f"('gt_9990', {str(yes).lower()}), ('gt_99999', {str(no).lower()}) "
        "AS t(probe, ask)"
    )


def q_sparql_subquery(spark, sf_dir):
    """SPARQL 1.1 subquery: top-5 customers by balance (deterministic
    tiebreak on name), names resolved in the outer query."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name ?bal WHERE {{
          ?c t:name ?c_name .
          {{ SELECT ?c ?bal WHERE {{ ?c a t:Customer ; t:acctbal ?bal ; t:name ?nm }}
             ORDER BY DESC(?bal) ?nm LIMIT 5 }}
        }}""",
        {"c_name": ("c_name", "lex"), "c_acctbal": ("bal", "double")},
    )


def q_sparql_bind(spark, sf_dir):
    """BIND arithmetic + filter on the bound variable."""
    e = _graph(spark, sf_dir)
    return _sel(
        e,
        f"""{PREFIX}
        SELECT ?c_name ?fee WHERE {{
          ?c a t:Customer ; t:name ?c_name ; t:acctbal ?bal .
          BIND(?bal * 0.1 AS ?fee)
          FILTER(?fee > 900)
        }}""",
        {"c_name": ("c_name", "lex"), "fee": ("fee", "double")},
    )


def q_sparql_construct(spark, sf_dir):
    """CONSTRUCT: template instantiation over a BGP; result triples
    project to plain columns for the oracle."""
    e = _graph(spark, sf_dir)
    g = e.construct(
        f"""{PREFIX}
        CONSTRUCT {{ ?c t:inRegion ?r }} WHERE {{
          ?c a t:Customer ; t:nation ?n . ?n t:region ?r .
        }}"""
    )
    return g.select(
        F.col("st.lex").alias("s"), F.col("ot.lex").alias("o")
    )


def q_sparql_describe(spark, sf_dir):
    """DESCRIBE <urn:n:5> (symmetric one-step: forward statements of
    the node plus statements pointing at it).  The oracle enumerates
    the direct mapping's triples about nation 5 in SQL."""
    e = _graph(spark, sf_dir)
    g = e.describe("DESCRIBE <urn:n:5>")
    return g.select(
        F.col("st.lex").alias("s"), F.col("pt.lex").alias("p"), F.col("ot.lex").alias("o")
    )


def q_text_chunks(spark, sf_dir):
    """Document chunking (``pipeline/chunk.py``): 64-token windows
    advancing by 48 (16-token overlap) — the context-window packing /
    RAG-indexing unit-of-work transform.  Pure column expressions, one
    Generate pair per document, no shuffle.  The DuckDB oracle
    rebuilds identical windows with range()+list slicing over the same
    tokenization."""
    from database_spark.pipeline.chunk import chunk_frame

    docs = _read(spark, sf_dir, "documents").repartition(32, "doc_id")
    return chunk_frame(docs, chunk_tokens=64, overlap=16).orderBy(
        "doc_id", "chunk_idx"
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (``pipeline/decontaminate.py``; the
    GPT-3 appendix-C n-gram hygiene step a training pipeline runs
    before every model): documents with ``doc_id % 10 == 0`` play the
    held-out benchmark set; every other document sharing a word 5-gram
    with any of them is flagged with the count of distinct benchmark
    docs it hits.  The benchmark shingle set is BROADCAST, so the
    corpus side streams map-side — no corpus shuffle, nothing
    all-pairs.  The oracle rebuilds the identical shingles with
    DuckDB's regexp_extract_all + list slicing."""
    from database_spark.pipeline.decontaminate import contaminated

    # the test parquet is a single split, which would serialize the
    # shingle build on one core; at 100 TB the scan arrives already
    # split, so this repartition is a local-shape correction only
    docs = _read(spark, sf_dir, "documents").repartition(32, "doc_id")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return contaminated(corpus, bench).orderBy("doc_id")


def q_pii_redact(spark, sf_dir):
    """PII redaction (``pipeline/clean.py``): scrub emails, phone
    numbers, and IPv4 addresses; report per-document match counts.
    Row-local regexp chains — no shuffle, the corpus streams map-side
    through its scan partitioning.  The synthetic corpus carries no
    PII, so the entry SPIKES each document with deterministic
    doc_id-derived PII first (both engines build the identical spiked
    text); the DuckDB oracle runs the same RE2-safe patterns."""
    from database_spark.pipeline.clean import pii_frame

    docs = _spread(_read(spark, sf_dir, "documents")).select("doc_id", "text")
    spiked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("@mail.example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or 415-555-0142"),
        ).alias("text"),
    )
    return pii_frame(spiked).orderBy("doc_id")


def q_seq_pack(spark, sf_dir):
    """Sequence packing (``pipeline/pack.py``): document-order greedy
    packing into 512-token bins across 16 shards — ONE shuffle, then a
    per-shard window cumsum (sorts are per shard, never global; shard
    count = write parallelism at 100 TB).  Returns the per-bin
    manifest; the DuckDB oracle computes identical bins with the same
    window function."""
    from database_spark.pipeline.pack import pack_summary

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        pack_summary(docs, budget=512, shards=16)
        .select(
            "shard", "bin", "n_docs", F.col("n_tokens").cast("long").alias("n_tokens")
        )
        .orderBy("shard", "bin")
    )


def q_text_quality(spark, sf_dir):
    """Language-ID + quality heuristics + fingerprint — every component
    mirrored exactly by the SQL oracle."""
    from database_spark.pipeline import text as TX

    d = _spread(_read(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        TX.lang_id(F.col("text")).alias("lang_guess"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact token-trigram Jaccard over doc pairs (bounded subset —
    the all-pairs oracle is quadratic)."""
    from database_spark.pipeline import dedup

    d = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.5)


SIMHASH_BITS = 60  # 15 md5 hex chars → positive long in both engines
# tight bound: the synthetic docs share so much vocabulary that even
# hamming<=2 yields ~1.3k pairs over the 500-doc slice (incl. planted
# exact dups at hamming 0) — a loose bound degenerates to all-pairs
SIMHASH_MAX_HAMMING = 2


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs over a portable md5-derived token hash —
    the DuckDB oracle re-derives the identical 60-bit signatures from
    md5 nibbles, so the banded Hamming join is exact-verified
    cross-engine.  Pigeonhole banding generates candidates; the final
    answer is the full set-semantic quantity (all pairs with
    Hamming(sig) <= max_hamming), which the oracle computes
    quadratically."""
    from database_spark.pipeline import dedup
    from database_spark.pipeline.text import tokens

    d = (
        _read(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 500)
        .where(F.size(tokens(F.col("text"))) > 0)
    )
    return dedup.simhash_near_pairs(
        d,
        "doc_id",
        "text",
        max_hamming=SIMHASH_MAX_HAMMING,
        bits=SIMHASH_BITS,
        token_hash=lambda t: dedup.md5_token_hash(t, SIMHASH_BITS),
    )


LSH_DIM = 64
# 8 planes = 256 buckets/table: random near-orthogonal pairs collide
# with p ~ 0.5^8 per table, so the candidate set is a few % of the
# quadratic pair space (4 planes kept ~77% of all pairs — no better
# than brute force).  The oracle emulates the same quantizer, so the
# gate exact-verifies candidates at any setting.
LSH_PLANES = 8
LSH_TABLES = 8
LSH_THRESHOLD = 0.42  # synthetic embeddings are near-orthogonal (max pair cos ~0.51)
#: corpus size at which LSH_PLANES buckets hold their design occupancy
#: (the sf0.1 embeddings table); see _lsh_planes_for
LSH_BASE_N = 2000


def _lsh_planes_for(n: int) -> int:
    """Plane count scaled so expected bucket occupancy stays CONSTANT
    as the corpus grows: with fixed planes the bucket count is fixed,
    occupancy grows with n, and within-bucket candidate pairs grow
    O(n²) — measured 15x wall for 10x data at sf1 before this.  One
    extra plane per doubling (buckets ∝ n) keeps candidate generation
    linear.  The oracle SQL computes the SAME formula in-query
    (planes live in a relational CTE gated on ``COUNT(*)``), so the
    scaled path is hash-verifiable at ANY scale, not just where the
    plane count equals LSH_PLANES (r8 verdict ask #1)."""
    import math

    return LSH_PLANES + max(0, math.ceil(math.log2(max(n, 1) / LSH_BASE_N)))


#: extra planes one Hamming-1 probe pass compensates before table
#: growth takes over (measured in test_lsh_multiprobe_recall_*)
LSH_PROBE_COMP = 5
#: per-plane table growth factor past LSH_PROBE_COMP extra planes —
#: the standard b/r banding rule b ∝ (1/p)^Δ at the design agreement
#: probability p ≈ 0.856 (plane agreement of a cos≈0.9 near-dup pair)
LSH_TABLE_GROWTH = 1.168


def _lsh_probe_for(n_planes: int) -> int:
    """Multiprobe Hamming radius, CAPPED at 1 (r9 verdict wrong #2):
    radius R costs Σ C(planes, j≤R) probe masks per doc per table —
    combinatorial in R, which at 100 TB corpus sizes (Δ≈19 → R=4 →
    ~20k masks/doc/table under the old ceil(Δ/5) rule) becomes the
    quadratic blowup plane scaling was built to avoid.  Radius 1 keeps
    probes at exactly 1 + planes = O(log n) per doc per table; recall
    beyond LSH_PROBE_COMP extra planes is restored by GROWING TABLES
    (``_lsh_tables_for`` — b/r banding), whose cost is linear and
    predictable.  Radius 0 at or below LSH_PLANES, so gate scales
    (sf0.01/sf0.1, planes == LSH_PLANES) are untouched."""
    return 0 if n_planes <= LSH_PLANES else 1


def _lsh_tables_for(n_planes: int) -> int:
    """Table count under the b/r banding rule: Hamming-1 probing
    compensates the first LSH_PROBE_COMP extra planes; each further
    plane multiplies the per-table miss rate by ~1/p, so the table
    count grows by LSH_TABLE_GROWTH per plane to hold overall recall.
    The oracle SQL computes the SAME ladder in-query from COUNT(*)
    (integer CASE ladder generated from this function — no float
    ceil-boundary drift between engines)."""
    import math

    over = max(0, n_planes - LSH_PLANES - LSH_PROBE_COMP)
    return int(math.ceil(LSH_TABLES * LSH_TABLE_GROWTH**over))


_NROWS_CACHE: dict = {}


def _table_rows(spark, sf_dir: str, table: str) -> int:
    """Cached row count for LSH parameter selection: one metadata-only
    count per (path, mtime) per session instead of a Spark action per
    entry invocation (r8 verdict ask #8 — at 100 TB a full count per
    query submission is a wasted pass; table stats/metadata serve it)."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = 0.0
    key = (path, mtime)
    n = _NROWS_CACHE.get(key)
    if n is None:
        n = _NROWS_CACHE[key] = _read(spark, sf_dir, table).count()
    return n
IVF_CELLS = 16
IVF_PROBE = 4


def q_lsh_cosine_pairs(spark, sf_dir):
    """Hyperplane-LSH near-dup pairs over embeddings, exact-cosine
    verified.  The oracle emulates the same deterministic quantizer
    (plane constants inlined into the SQL from the same Python
    generator — no drift), so candidate generation AND verification
    are checked, not just the threshold filter."""
    from database_spark.pipeline import similarity

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planes = _lsh_planes_for(_table_rows(spark, sf_dir, "embeddings"))
    return similarity.lsh_similar_pairs(
        emb, "vec_id", "v", dim=LSH_DIM,
        threshold=LSH_THRESHOLD, n_planes=planes,
        n_tables=_lsh_tables_for(planes),
        probe_hamming=_lsh_probe_for(planes),
    )


def q_embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup DEDUP (the dedup-family view of the
    embedding space): LSH pairs → connected components → min-id
    representative per cluster, one row per embedding with its cluster
    label and keep flag.  The oracle replays the exact quantizer
    (inlined plane constants), threshold-verifies with exact cosine,
    closes the pair graph with a recursive CTE, and picks the same
    min-id representative."""
    from database_spark.pipeline import dedup

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planes = _lsh_planes_for(_table_rows(spark, sf_dir, "embeddings"))
    return dedup.embedding_near_dup_clusters(
        emb, "vec_id", "v", dim=LSH_DIM,
        threshold=LSH_THRESHOLD, n_planes=planes,
        n_tables=_lsh_tables_for(planes),
        probe_hamming=_lsh_probe_for(planes),
    ).select(F.col("id").alias("vec_id"), "cluster", "keep")


def q_ivf_topk(spark, sf_dir):
    """IVF-style ANN top-k (LSH-sign cells + multi-probe), emulated
    exactly by the oracle — checks quantization, probing and ranking."""
    from database_spark.pipeline import similarity

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    return similarity.ivf_topk(
        emb, q, "vec_id", "v", "qid", "qv",
        k=5, n_cells=IVF_CELLS, n_probe=IVF_PROBE, dim=LSH_DIM,
    )


#: per-language keep rates for the stratified-sampling entry (mixture
#: weights; quantized to 1/65536 — see pipeline/sample.py)
SAMPLE_RATES = {"en": 0.8, "de": 0.3, "zh": 0.5}
SAMPLE_DEFAULT_RATE = 0.1
SAMPLE_SEED = "s0"


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language sampling of the documents table
    (pipeline/sample.py): membership is a pure function of
    md5(seed||doc_id), so the oracle reproduces the exact sample with
    one SQL predicate.  Map-side only — no shuffle at any scale."""
    from database_spark.pipeline import sample

    d = _read(spark, sf_dir, "documents")
    return sample.sample_stratified(
        d, "doc_id", "lang", SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE, seed=SAMPLE_SEED,
    ).select("doc_id", "lang")


def q_sample_quota(spark, sf_dir):
    """Exact per-source quota sampling of the documents table
    (pipeline/sample.py::sample_quota) — the fixed-budget mixture
    step: at most 10 docs of src0, 7 of src1, 3 of every other source,
    selected as the quota-many smallest md5(seed||doc_id) per source.
    One stratum-keyed shuffle + a row_number window; deterministic, so
    DuckDB reproduces exact membership with the same window
    predicate."""
    from database_spark.pipeline import sample

    d = _read(spark, sf_dir, "documents")
    return sample.sample_quota(
        d, "doc_id", "source", {"src0": 10, "src1": 7},
        default_quota=3, seed="q0",
    ).select("doc_id", "source")


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-50 by total occurrences with document
    frequency (count desc, token asc tiebreak — deterministic in both
    engines so the LIMIT cuts the same set)."""
    from database_spark.pipeline import text as TX

    d = _spread(_read(spark, sf_dir, "documents"))
    return TX.vocab_topk(d, "text", k=50, id_col="doc_id")


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


def q_skew_hub_join(spark, sf_dir):
    """Deliberately hub-skewed equi join through ``operators/skew.py
    salted_join`` (r5 verdict Next #8): every third lineitem's part key
    is collapsed onto ONE hub key (~33% of all rows on a single join
    key — the power-law hub shape AQE's quantile-based splitting can
    miss when one key IS the partition).  ``salted_join`` sprays the
    hub across ``salt`` composite keys, so no reducer sees a whole hot
    key: the max (key, salt) group is ~1/salt of the hub, which
    ``tests/test_properties.py::test_salted_join_balances_hub`` asserts
    directly.  Result is oracle-checked against the plain join — the
    salt must be invisible in the answer."""
    from database_spark.operators.skew import salted_join

    li = _read(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_partkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        F.col("l_quantity").alias("qty"),
    )
    p = _read(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_brand"
    )
    joined = salted_join(li, p, "k", salt=8)
    return joined.groupBy("p_brand").agg(
        _dsum(F.col("qty"), "sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
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


def q_multimodal_decode(spark, sf_dir):
    """Multimodal decode plumbing, end-to-end and exact: one
    deterministic solid-color 24-bit BMP per document is ENCODED and
    then DECODED inside the same Arrow-batched ``mapInPandas`` path
    ``pipeline.multimodal.extract_features`` uses (media_codec
    decode_image), emitting decoded geometry + the (0,0) pixel; the
    oracle recomputes those facts arithmetically from doc_id."""
    import pandas as _pd

    d = _spread(_read(spark, sf_dir, "documents")).select("doc_id")

    def run(batches):
        from database_spark.pipeline.media_codec import decode_image

        def bmp(w, h, r, g, b):
            import struct

            row = (bytes([b, g, r]) * w) + b"\x00" * ((4 - (w * 3) % 4) % 4)
            px = row * h
            header = struct.pack(
                "<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40
            ) + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
            )
            return header + px

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "r": [], "g": [], "b": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                r, g, b = did * 37 % 256, did * 59 % 256, did * 83 % 256
                px = decode_image(bmp(w, h, r, g, b))
                out["doc_id"].append(did)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["r"].append(int(px[0, 0, 0]))
                out["g"].append(int(px[0, 0, 1]))
                out["b"].append(int(px[0, 0, 2]))
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        "doc_id long, width long, height long, r long, g long, b long",
    )


def q_text_stats(spark, sf_dir):
    d = _spread(_read(spark, sf_dir, "documents"))
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


def q_events_asof(spark, sf_dir):
    """As-of join: each purchase event joined to the same user's
    latest click at-or-before the purchase timestamp.

    Spark-first shape: union + window (one shuffle, no row
    multiplication) — see operators/temporal.py.  The oracle is
    DuckDB's native ``ASOF LEFT JOIN``.
    """
    from database_spark.operators.temporal import asof_join

    ev = _read(spark, sf_dir, "events")
    # NULL keys injected on BOTH sides (user_id % 89 == 0): SQL
    # equality never matches NULL = NULL, and DuckDB's native ASOF
    # JOIN agrees — this gates the null-key semantics of asof_join
    # (null-keyed left rows null-extend, null-keyed right rows are
    # inert), not just the happy path
    nk = F.when(F.col("user_id") % 89 != 0, F.col("user_id"))
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", nk.alias("user_id"), "ts", F.col("value").alias("purchase_value")
    )
    # as-of right sides must be unique per (key, ts)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy(nk.alias("user_id"), "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    out = asof_join(
        purch,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_value"],
        suffix="_click",
    )
    # nullable timestamps surface as epoch micros: pandas 2.x cannot
    # compare NaT across ns/us datetime units, so the gate would flag
    # equal values as different (non-null ts stays a real timestamp)
    return out.withColumn("ts_click_us", F.unix_micros("ts_click")).drop(
        "ts_click"
    )


def q_events_asof_fwd(spark, sf_dir):
    """Forward as-of join: each purchase joined to the same user's
    EARLIEST click at-or-after it (direction='forward', pandas
    merge_asof parity).  Oracle: DuckDB ASOF with the inequality
    flipped."""
    from database_spark.operators.temporal import asof_join

    ev = _read(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    out = asof_join(
        purch,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_value"],
        suffix="_click",
        direction="forward",
    )
    return out.withColumn("ts_click_us", F.unix_micros("ts_click")).drop(
        "ts_click"
    )


def q_events_range_join(spark, sf_dir):
    """Interval/range join: for each purchase, the count and value sum
    of the same user's clicks in the hour strictly before it.

    Spark-first shape: quantize to 1h buckets, equi-join on
    (user, bucket) with a 2-bucket left expansion, exact filter —
    never an inequality nested loop (operators/temporal.py).
    """
    from database_spark.operators.temporal import range_join

    ev = _read(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    # inner range join once, aggregate, then left-join the (small)
    # per-purchase aggregate back — how='left' on raw pairs would run
    # the bucket join twice (matched + anti branches)
    pairs = range_join(
        purch, clicks, on="user_id", lower_s=0.0, upper_s=3600.0
    )
    agg = pairs.groupBy("l_event_id").agg(
        F.count(F.lit(1)).alias("__n"),
        # decimal partial sums: cross-row addition order-independent,
        # so the oracle's SUM agrees exactly (stream_sessions precedent)
        F.sum(F.col("r_value").cast("decimal(18,6)")).alias("__s"),
    )
    return (
        purch.join(agg, purch.event_id == agg.l_event_id, "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_clicks_1h"),
            F.coalesce(F.col("__s").cast("double"), F.lit(0.0)).alias(
                "sum_click_value"
            ),
        )
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters (top-bigram fraction, duplicate
    trigram fraction) — zero-shuffle per-row array folds
    (pipeline/text.py repetition_stats)."""
    from database_spark.pipeline.text import repetition_stats

    d = _spread(_read(spark, sf_dir, "documents"))
    return repetition_stats(d, "text", "doc_id")


def q_dup_spans(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2021): merged token
    ranges whose 8-token shingle occurs >= 2 times corpus-wide — the
    suffix-array dedup pass re-expressed as shingle-hash aggregate +
    join-back + per-doc interval merge (pipeline/dedup.py
    duplicate_spans)."""
    from database_spark.pipeline.dedup import duplicate_spans

    d = _read(spark, sf_dir, "documents")
    return duplicate_spans(d, "doc_id", "text", width=8, min_count=2)


def q_corpus_funnel(spark, sf_dir):
    """Corpus curation funnel: survivors after each cumulative filter
    stage — language (en), quality (>= 0.75), repetition (top-bigram
    <= 0.06), and exact-substring dedup (no duplicated 8-gram span) —
    the composition every training-data pipeline runs.  All per-doc
    flags come from the same operators the individual entries gate
    (pipeline/text.py, pipeline/dedup.py); one scan computes the row
    flags, one tiny join attaches the repetition columns, one anti-set
    flags span-duplicated docs, one aggregate folds the funnel."""
    from pyspark.sql.window import Window as _W  # noqa: F401

    from database_spark.pipeline import text as TX
    from database_spark.pipeline.dedup import duplicate_spans

    d0 = _read(spark, sf_dir, "documents")
    d = _spread(d0)
    if d is not d0:
        # the spread only fires when the corpus scan is cluster-narrow
        # (small input): materialize the repartitioned copy ONCE so the
        # funnel's three text passes (repetition, span-dedup, flags)
        # read blocks instead of re-scanning and re-shuffling the text
        # three times.  At scale the spread is a no-op and the three
        # passes stream the parquet scan as before.
        from database_spark.operators import lifecycle as L

        d = L.checkpoint(d)
    rep = TX.repetition_stats(d, "text", "doc_id").select(
        "doc_id", "top_bigram_frac"
    )
    dup_docs = (
        duplicate_spans(d, "doc_id", "text", width=8, min_count=2)
        .select("doc_id")
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    flags = (
        d.select(
            "doc_id",
            (TX.lang_id(F.col("text")) == "en").cast("int").alias("f1"),
            (TX.quality_score(F.col("text")) >= 0.75)
            .cast("int")
            .alias("f2"),
        )
        .join(rep, "doc_id")
        .withColumn("f3", (F.col("top_bigram_frac") <= 0.06).cast("int"))
        .join(dup_docs, "doc_id", "left")
        .withColumn("f4", F.col("__dup").isNull().cast("int"))
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("f1").alias("n1"),
        F.sum(F.col("f1") * F.col("f2")).alias("n2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("n3"),
        F.sum(
            F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4")
        ).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'all', n0, 1, 'lang_en', n1, 2, 'quality', n2,"
            " 3, 'repetition', n3, 4, 'substring_dedup', n4)"
            " as (stage, stage_name, n_docs)"
        )
    )


def q_kmeans_cells(spark, sf_dir):
    """Trained IVF: deterministic Lloyd k-means (k=8, 3 iterations,
    fixed-point centroid sums) over the embeddings table; returns the
    final (vec_id, cell) assignment (pipeline/kmeans.py)."""
    from database_spark.pipeline.kmeans import kmeans_assign

    emb = _read(spark, sf_dir, "embeddings")
    return kmeans_assign(
        emb, "vec_id", "embedding",
        k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE,
    )


#: k-means entry hyperparameters — the oracle SQL is GENERATED from
#: these same constants (_kmeans_oracle), so they cannot drift
KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_SCALE = 1_000_000


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sparql_bgp_join": q_sparql_bgp_join,
    "sparql_filter": q_sparql_filter,
    "sparql_agg_group": q_sparql_agg_group,
    "sparql_optional": q_sparql_optional,
    "sparql_optional_rejoin": q_sparql_optional_rejoin,
    "sparql_outer_union": q_sparql_outer_union,
    "sparql_union": q_sparql_union,
    "sparql_not_exists": q_sparql_not_exists,
    "sparql_minus": q_sparql_minus,
    "sparql_minus_nullable": q_sparql_minus_nullable,
    "sparql_exists": q_sparql_exists,
    "sparql_path_zero": q_sparql_path_zero,
    "sparql_nps": q_sparql_nps,
    "sparql_ref_lookup": q_sparql_ref_lookup,
    "sparql_graph_scan": q_sparql_graph_scan,
    "sparql_graph_pred_scan": q_sparql_graph_pred_scan,
    "sparql_reduced": q_sparql_reduced,
    "sparql_federation": q_sparql_federation,
    "sparql_path_seq": q_sparql_path_seq,
    "sparql_path_plus": q_sparql_path_plus,
    "sparql_values": q_sparql_values,
    "sparql_distinct": q_sparql_distinct,
    "pricing_summary": q_pricing_summary,
    "skew_hub_join": q_skew_hub_join,
    "shipping_priority": q_shipping_priority,
    "local_suppliers": q_local_suppliers,
    "events_hourly": q_events_hourly,
    "window_top_order": q_window_top_order,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "multimodal_decode": q_multimodal_decode,
    "similarity_topk": q_similarity_topk,
    "sparql_fts": q_sparql_fts,
    "sparql_geo_rect": q_sparql_geo_rect,
    "rdfs_closure_types": q_rdfs_closure_types,
    "gas_bfs_depth": q_gas_bfs_depth,
    "gas_cc": q_gas_cc,
    "gas_sssp": q_gas_sssp,
    "fast_count": q_fast_count,
    "gas_cc_derived": q_gas_cc_derived,
    "gas_pagerank": q_gas_pagerank,
    "gas_bfs_large": q_gas_bfs_large,
    "gas_sssp_large": q_gas_sssp_large,
    "gas_cc_large": q_gas_cc_large,
    "gas_pagerank_large": q_gas_pagerank_large,
    "gas_fuzzy_band": q_gas_fuzzy_band,
    "stream_hourly": q_stream_hourly,
    "stream_dedup": q_stream_dedup,
    "stream_sessions": q_stream_sessions,
    "minhash_pairs": q_minhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "update_roundtrip": q_update_roundtrip,
    "graph_bulk_degree": q_graph_bulk_degree,
    "changeset_delta": q_changeset_delta,
    "sparql_ask": q_sparql_ask,
    "sparql_subquery": q_sparql_subquery,
    "sparql_bind": q_sparql_bind,
    "sparql_construct": q_sparql_construct,
    "sparql_describe": q_sparql_describe,
    "text_quality": q_text_quality,
    "decontaminate": q_decontaminate,
    "text_chunks": q_text_chunks,
    "pii_redact": q_pii_redact,
    "seq_pack": q_seq_pack,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash_pairs": q_simhash_pairs,
    "lsh_cosine_pairs": q_lsh_cosine_pairs,
    "embedding_dedup": q_embedding_dedup,
    "ivf_topk": q_ivf_topk,
    "sample_stratified": q_sample_stratified,
    "sample_quota": q_sample_quota,
    "vocab_topk": q_vocab_topk,
    "events_asof": q_events_asof,
    "events_asof_fwd": q_events_asof_fwd,
    "events_range_join": q_events_range_join,
    "repetition_stats": q_repetition_stats,
    "kmeans_cells": q_kmeans_cells,
    "dup_spans": q_dup_spans,
    "corpus_funnel": q_corpus_funnel,
}


def _text_quality_oracle() -> str:
    """SQL oracle generated from the SAME marker table the Spark
    implementation uses (database_spark.pipeline.text.LANG_MARKERS) —
    no drift possible."""
    from database_spark.pipeline.text import LANG_MARKERS

    hit_cols = ",\n".join(
        f"    len(regexp_extract_all(lower(text), '\\b({'|'.join(ws)})\\b')) AS h_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    gmax = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    lang_case = "CASE WHEN " + gmax + " = 0 THEN 'und'\n"
    for lg in langs:
        lang_case += f"         WHEN h_{lg} = {gmax} THEN '{lg}'\n"
    lang_case += "         ELSE 'und' END"
    en = "|".join(LANG_MARKERS["en"])
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS tk,
{hit_cols}
          FROM documents
        ), feat AS (
          SELECT doc_id, tk,
                 {lang_case} AS lang_guess,
                 length(text) AS n_chars,
                 len(tk) AS n_tokens,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                 length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
                 len(regexp_extract_all(lower(text), '\\b({en})\\b')) AS stop
          FROM base
        )
        SELECT doc_id, lang_guess,
               round((
                   (CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1.0
                         WHEN n_chars >= 50 THEN 0.5 ELSE 0.0 END)
                 + (CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END)
                 + (CASE WHEN n_chars > 0
                         THEN 1.0 - least(1.0, punct * 10.0 / n_chars)
                         ELSE 0.0 END)
                 + (CASE WHEN n_tokens > 0
                              AND alpha / n_tokens BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.5 END)
                 + (CASE WHEN n_tokens > 0
                         THEN least(1.0, stop * 4.0 / n_tokens)
                         ELSE 0.0 END)
               ) / 5.0, 6) AS quality,
               md5(array_to_string(tk, ' ')) AS fp,
               CAST(ceil((len(tk) + ceil(n_chars / 4.0)) / 2.0) AS BIGINT)
                 AS bpe_tokens
        FROM feat
    """


_TEXT_QUALITY_ORACLE = _text_quality_oracle()


def _kmeans_oracle(k: int, iters: int, scale: int) -> str:
    """Chained-CTE DuckDB replica of pipeline/kmeans.py: one CTE pair
    (assign, recompute) per Lloyd iteration, generated from the SAME
    (k, iters, scale) constants the Spark entry uses — no drift
    possible.  Centroid sums run in exact BIGINT fixed-point, so the
    cross-row aggregation is order-independent on both engines;
    distances round to 1e-9 before the argmin."""
    sql = f"""
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS vi
          FROM embeddings
        ), vd0 AS (
          SELECT vec_id, vi,
                 list_transform(vi, x -> CAST(x AS DOUBLE) / {scale}.0) AS vd
          FROM v
        ), c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
                 vd AS c
          FROM (SELECT vec_id, vd FROM vd0 ORDER BY vec_id LIMIT {k})
        )"""
    for t in range(1, iters + 2):
        sql += f""", a{t} AS (
          SELECT vec_id, vi, vd, j AS cell FROM (
            SELECT p.vec_id, p.vi, p.vd, c.j,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY round(list_sum(list_transform(
                                range(1, len(p.vd) + 1),
                                i -> (p.vd[i] - c.c[i]) * (p.vd[i] - c.c[i])
                              )), 9) ASC,
                              c.j ASC) AS rn
            FROM vd0 p CROSS JOIN c{t - 1} c
          ) WHERE rn = 1
        )"""
        if t <= iters:
            sql += f""", s{t} AS (
          SELECT cell, d, sum(x) AS s, count(*) AS n FROM (
            SELECT cell, unnest(vi) AS x,
                   unnest(range(1, len(vi) + 1)) AS d
            FROM a{t}
          ) GROUP BY 1, 2
        ), c{t} AS (
          SELECT j, c FROM (
            SELECT cell AS j,
                   list(CAST(s AS DOUBLE) / n / {scale}.0 ORDER BY d) AS c
            FROM s{t} GROUP BY cell
            UNION ALL
            SELECT j, c FROM c{t - 1}
            WHERE j NOT IN (SELECT DISTINCT cell FROM a{t})
          )
        )"""
    sql += f"\n        SELECT vec_id, cell FROM a{iters + 1}"
    return sql


def _simhash_oracle() -> str:
    """DuckDB emulation of the portable-md5 SimHash: bit i (0-based,
    LSB) of a token's 60-bit hash comes from md5 hex nibble
    15 - i//4, shifted by i%4 — identical to
    conv(substr(md5(t),1,15),16,10) bit extraction."""
    k, bits = SIMHASH_MAX_HAMMING, SIMHASH_BITS
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
          FROM documents WHERE doc_id < 500
        ), th AS (
          SELECT doc_id, md5(t) AS h FROM tok
        ), bits AS (
          SELECT doc_id, i,
                 SUM(CASE WHEN ((strpos('0123456789abcdef',
                                        substr(h, {bits // 4} - (i // 4), 1)) - 1)
                                >> (i % 4)) & 1 = 1
                          THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN (SELECT unnest(generate_series(0, {bits - 1})) AS i) g
          GROUP BY doc_id, i
        ), sig AS (
          SELECT doc_id,
                 SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS sg
          FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sg, b.sg)) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sg, b.sg)) <= {k}
    """


def _plane_sql(dim: int, plane_i: int, seed: int) -> str:
    from database_spark.pipeline.similarity import _hyperplane

    return "[" + ", ".join(repr(x) for x in _hyperplane(dim, plane_i, seed)) + "]"


def _bucket_sql(vec: str, dim: int, n_planes: int, seed: int) -> str:
    """Mirror of similarity.lsh_bucket: plane 0 is the MSB."""
    parts = [
        f"(CASE WHEN list_dot_product({vec}, {_plane_sql(dim, i, seed)}) >= 0"
        f" THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
        for i in range(n_planes)
    ]
    return "(" + " + ".join(parts) + ")"


#: plane pool depth for the scale-parameterized oracle: covers
#: oracle pool coverage: n ≤ LSH_BASE_N · 2^10 ≈ 2M embeddings — far
#: past any DuckDB oracle run (sf1 is 20k).  Beyond it the SQL raises
#: via error() instead of silently quantizing with a truncated pool;
#: the Spark side scales on unchanged formulas (gated by the
#: parameterized-base equivalence test in test_pipeline.py).
_MAX_ORACLE_PLANES = LSH_PLANES + 10


def _lsh_quantize_ctes() -> str:
    """The scale-PARAMETERIZED quantizer CTE chain shared by the LSH
    oracles: the plane count (``np``), multiprobe radius (capped at 1)
    and table count (``nt`` — the b/r growth ladder) are computed IN
    SQL from ``COUNT(*)`` with the same formulas as
    :func:`_lsh_planes_for` / :func:`_lsh_probe_for` /
    :func:`_lsh_tables_for`; plane constants live in one relational
    VALUES pool (``p.i < np AND p.tbl < nt`` gates how many fire).
    The table ladder is an integer CASE generated from the Python
    function, so there is no float ceil-boundary drift between
    engines.  Ends with ``cand(id_a, id_b)``."""
    max_tables = _lsh_tables_for(_MAX_ORACLE_PLANES)
    plane_rows = ",\n            ".join(
        f"({t}, {i}, {_plane_sql(LSH_DIM, i, 1000 + t)})"
        for t in range(max_tables)
        for i in range(_MAX_ORACLE_PLANES)
    )
    ladder = " ".join(
        f"WHEN {d} THEN {_lsh_tables_for(LSH_PLANES + d)}"
        for d in range(_MAX_ORACLE_PLANES - LSH_PLANES + 1)
    )
    return f"""v AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), nn AS (
          SELECT CASE WHEN np0 > {_MAX_ORACLE_PLANES}
                      THEN CAST(error('corpus exceeds the oracle plane pool') AS INT)
                      ELSE np0 END AS np
          FROM (
            SELECT {LSH_PLANES} + GREATEST(0, CAST(CEIL(LOG2(
                     GREATEST(COUNT(*), 1) / {LSH_BASE_N}.0)) AS INT)) AS np0
            FROM v
          )
        ), rad AS (
          SELECT CASE WHEN np <= {LSH_PLANES} THEN 0 ELSE 1 END AS r
          FROM nn
        ), ntc AS (
          SELECT CASE np - {LSH_PLANES} {ladder}
                 ELSE CAST(error('corpus exceeds the oracle table ladder') AS INT)
                 END AS nt
          FROM nn
        ), planes(tbl, i, pv) AS (
          VALUES
            {plane_rows}
        ), sb AS (
          SELECT e.vec_id, p.tbl,
                 CASE WHEN list_dot_product(e.v, p.pv) >= 0
                      THEN (1::BIGINT << (nn.np - 1 - p.i)) ELSE 0 END AS bit
          FROM v e CROSS JOIN nn CROSS JOIN ntc
          JOIN planes p ON p.i < nn.np AND p.tbl < ntc.nt
        ), b AS MATERIALIZED (
          SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM sb GROUP BY vec_id, tbl
        ), m1 AS (
          SELECT (1::BIGINT << CAST(g.i AS INT)) AS m
          FROM (SELECT unnest(generate_series(0, (SELECT np FROM nn) - 1)) AS i) g
        ), masks AS (
          SELECT 0::BIGINT AS m
          UNION ALL SELECT m FROM m1 WHERE (SELECT r FROM rad) >= 1
        ), lp AS (
          SELECT vec_id, tbl, xor(bucket, m) AS bucket
          FROM b CROSS JOIN masks
        ), cand AS (
          SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
          FROM lp l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
                            AND l.vec_id < r.vec_id
        )"""


def _lsh_pairs_oracle() -> str:
    return f"""
        WITH {_lsh_quantize_ctes()}
        SELECT id_a, id_b,
               round(list_dot_product(a.v, bb.v) /
                     (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v))),
                     6) AS cos
        FROM cand JOIN v a ON cand.id_a = a.vec_id
                  JOIN v bb ON cand.id_b = bb.vec_id
        WHERE round(list_dot_product(a.v, bb.v) /
                    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v))),
                    6) >= {LSH_THRESHOLD}
    """


#: fixed min-label-propagation rounds in the dedup oracle's SQL
#: connected components — covers any pair-graph diameter up to ~96
#: (the sf1 giant component converges in 26; insufficiency shows up
#: as a LOUD hash mismatch, never a silently-wrong pass)
_CC_ORACLE_ROUNDS = 96


def _cc_label_ctes(rounds: int = _CC_ORACLE_ROUNDS) -> str:
    """Chained-CTE connected components for DuckDB: per round, every
    node takes the min label among itself and its neighbors
    (propagate), then one pointer jump (l ← l∘l).  Replaces the old
    RECURSIVE transitive closure, which materializes Σ|component|²
    rows — the sf1 pair graph has a 10.5k-node component, so the
    closure was ~110M rows and timed out; label propagation is
    O(rounds · |E|).  Expects ``sym(a, b)`` + ``nodes(n)`` upstream;
    ends with ``comp(node, component)``."""
    parts = ["l0 AS MATERIALIZED (SELECT n AS node, n AS lbl FROM nodes)"]
    for r in range(1, rounds + 1):
        prev, cur = f"l{r - 1}", f"l{r}"
        parts.append(
            f"""p{r} AS MATERIALIZED (
          SELECT s.a AS node, MIN(l.lbl) AS nl
          FROM sym s JOIN {prev} l ON s.b = l.node GROUP BY s.a
        ), j{r} AS MATERIALIZED (
          SELECT l.node, LEAST(l.lbl, COALESCE(p.nl, l.lbl)) AS lbl
          FROM {prev} l LEFT JOIN p{r} p ON l.node = p.node
        ), {cur} AS MATERIALIZED (
          SELECT x.node, LEAST(x.lbl, COALESCE(y.lbl, x.lbl)) AS lbl
          FROM j{r} x LEFT JOIN j{r} y ON x.lbl = y.node
        )"""
        )
    parts.append(
        f"comp AS (SELECT node, lbl AS component FROM l{rounds})"
    )
    return ", ".join(parts)


def _embedding_dedup_oracle() -> str:
    return f"""
        WITH {_lsh_quantize_ctes()}, pairs AS MATERIALIZED (
          SELECT id_a, id_b
          FROM cand JOIN v a ON cand.id_a = a.vec_id
                    JOIN v bb ON cand.id_b = bb.vec_id
          WHERE round(list_dot_product(a.v, bb.v) /
                      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v))),
                      6) >= {LSH_THRESHOLD}
        ), sym AS MATERIALIZED (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ), nodes AS MATERIALIZED (SELECT DISTINCT a AS n FROM sym),
        {_cc_label_ctes()}
        SELECT e.vec_id AS vec_id,
               coalesce(c.component, e.vec_id) AS cluster,
               (coalesce(c.component, e.vec_id) = e.vec_id) AS keep
        FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
    """


def _sample_stratified_oracle() -> str:
    """The exact sample membership predicate, rebuilt from the same
    rate constants: 4-hex-char md5 prefix vs per-stratum threshold
    (lexicographic compare == numeric for same-length lowercase hex)."""
    from database_spark.pipeline.sample import rate_to_hex

    cases = " ".join(
        f"WHEN '{s}' THEN '{rate_to_hex(r)}'"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5('{SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)), 1, 4)
              < CASE lang {cases} ELSE '{rate_to_hex(SAMPLE_DEFAULT_RATE)}' END
    """


def _ivf_topk_oracle() -> str:
    import math

    n_planes = max(1, int(math.log2(IVF_CELLS)))
    cell = _bucket_sql("v", LSH_DIM, n_planes, 42)
    qcell = _bucket_sql("qv", LSH_DIM, n_planes, 42)
    probes = ", ".join(
        ["qcell"] + [f"xor(qcell, {1 << b})" for b in range(min(IVF_PROBE - 1, n_planes))]
    )
    return f"""
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), d AS (
          SELECT vec_id AS neighbor_id, v AS dv, {cell} AS cell FROM v
        ), q0 AS (
          SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 3
        ), q1 AS (
          SELECT query_id, qv, {qcell} AS qcell FROM q0
        ), probes AS (
          SELECT DISTINCT query_id, qv, unnest([{probes}]) AS cell FROM q1
        ), scored AS (
          SELECT DISTINCT query_id, neighbor_id,
                 round(list_dot_product(dv, qv) /
                       (sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(qv, qv))),
                       6) AS cos
          FROM d JOIN probes USING (cell)
        )
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored) WHERE rank <= 5
    """


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
    "sparql_optional_rejoin": """
        WITH opt AS (
          SELECT n.n_name, c.c_custkey
          FROM nation n
          LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9990) c
            ON c.c_nationkey = n.n_nationkey
        )
        SELECT n_name, COUNT(*) AS n_ord, MIN(o_totalprice) AS min_price
        FROM opt JOIN orders o
          ON opt.c_custkey IS NULL OR opt.c_custkey = o.o_custkey
        GROUP BY n_name
    """,
    "sparql_outer_union": """
        WITH u AS (
          SELECT c.c_nationkey AS nk, c.c_name AS who, c.c_acctbal AS val
          FROM customer c WHERE c.c_acctbal > 9985
          UNION ALL
          SELECT NULL AS nk, s.s_name AS who, s.s_acctbal AS val
          FROM supplier s WHERE s.s_acctbal > 9950
        )
        SELECT n.n_name AS n_name, u.who AS who, u.val AS val
        FROM nation n LEFT JOIN u
          ON u.nk IS NULL OR u.nk = n.n_nationkey
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
    "sparql_minus": """
        SELECT c_name FROM customer WHERE c_nationkey IS DISTINCT FROM 5
    """,
    "sparql_minus_nullable": """
        WITH base AS (
          SELECT c.c_name AS c_name, s.s_name AS s_name
          FROM customer c
          LEFT JOIN supplier s
            ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > 9900
          WHERE c.c_acctbal > 9000
        )
        SELECT b.c_name AS c_name, b.s_name AS s_name FROM base b
        WHERE NOT EXISTS (
          SELECT 1 FROM supplier s2
          WHERE s2.s_name = b.s_name AND s2.s_acctbal > 9990)
    """,
    "sparql_exists": """
        SELECT c_name FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    "sparql_path_zero": """
        SELECT n_name, 'urn:n:' || CAST(n_nationkey AS VARCHAR) AS x FROM nation
        UNION ALL
        SELECT n_name, 'urn:r:' || CAST(n_regionkey AS VARCHAR) AS x FROM nation
    """,
    "sparql_nps": """
        SELECT 'urn:n:' || CAST(n_nationkey AS VARCHAR) AS s,
               'urn:r:' || CAST(n_regionkey AS VARCHAR) AS o
        FROM nation
    """,
    "sparql_ref_lookup": """
        SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS s,
               'urn:tpch:nation' AS p
        FROM customer WHERE c_nationkey = 7
        UNION ALL
        SELECT 'urn:s:' || CAST(s_suppkey AS VARCHAR) AS s,
               'urn:tpch:nation' AS p
        FROM supplier WHERE s_nationkey = 7
    """,
    "sparql_graph_scan": """
        SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS s,
               'urn:tpch:name' AS p, c_name AS o
        FROM customer WHERE c_nationkey = 7
        UNION ALL
        SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS s,
               'urn:tpch:mktsegment' AS p, c_mktsegment AS o
        FROM customer WHERE c_nationkey = 7
    """,
    "sparql_graph_pred_scan": """
        SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS s,
               c_mktsegment AS o
        FROM customer WHERE c_nationkey = 3
    """,
    "sparql_reduced": """
        SELECT DISTINCT c_mktsegment AS seg FROM customer
    """,
    "sparql_federation": """
        SELECT n_name, code
        FROM nation
        JOIN region ON n_regionkey = r_regionkey
        JOIN (VALUES ('AFRICA','af'),('AMERICA','am'),('ASIA','as'),
                     ('EUROPE','eu'),('MIDDLE EAST','me')) AS m(rn, code)
          ON r_name = m.rn
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
    "skew_hub_join": """
        WITH b AS (
          SELECT CASE WHEN l_partkey % 3 = 0 THEN 1 ELSE l_partkey END AS k,
                 l_quantity AS qty
          FROM lineitem
        )
        SELECT p.p_brand AS p_brand,
               CAST(SUM(b.qty) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM b JOIN part p ON p.p_partkey = b.k
        GROUP BY p.p_brand
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
    "multimodal_decode": """
        SELECT doc_id,
               4 + doc_id % 13 AS width,
               3 + doc_id % 7 AS height,
               (doc_id * 37) % 256 AS r,
               (doc_id * 59) % 256 AS g,
               (doc_id * 83) % 256 AS b
        FROM documents
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
    "sparql_fts": r"""
        -- reference cosine: dw = byte315(tf/|tf|) per (doc, token),
        -- qw = 1/sqrt(3) per query token, relevance = sum(qw*dw)
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
                   x -> len(x) > 0)) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
          FROM toks GROUP BY 1, 2
        ), mag AS (
          SELECT doc_id, sqrt(sum(tf*tf)) AS mag FROM tf GROUP BY 1
        ), wf AS (
          SELECT tf.doc_id, tf.token,
                 CAST(CAST(tf.tf / mag.mag AS FLOAT) AS DOUBLE) AS w32
          FROM tf JOIN mag USING (doc_id)
          WHERE tf.token IN ('spark', 'query', 'join')
        ), dw AS (
          -- Lucene SmallFloat byte315 encode/decode: truncate the
          -- float32 mantissa to 3 bits incl. the implicit leading 1
          SELECT doc_id, token,
                 pow(2, floor(log2(w32)))
                 * (1 + floor((w32 / pow(2, floor(log2(w32))) - 1) * 4) / 4)
                 AS w
          FROM wf
        )
        SELECT 'urn:d:' || CAST(doc_id AS VARCHAR) AS doc,
               round(sum((1.0 / sqrt(3.0)) * w), 9) AS relevance
        FROM dw GROUP BY doc_id
    """,
    "sparql_geo_rect": """
        SELECT DISTINCT 'urn:u:' || CAST(user_id AS VARCHAR) AS node
        FROM events
        WHERE ((user_id * 37) % 180) - 90 BETWEEN -45 AND 45
          AND ((user_id * 73) % 360) - 180 BETWEEN -90 AND 90
    """,
    "rdfs_closure_types": """
        SELECT 'urn:seg:' || c_mktsegment AS cls, count(*) AS n
        FROM customer GROUP BY 1
        UNION ALL
        SELECT 'urn:tpch:Customer' AS cls, count(*) AS n FROM customer
    """,
    "gas_bfs_depth": """
        SELECT 'urn:g:' || CAST(x AS VARCHAR) AS node, (x * 13) % 16 AS depth
        FROM range(0, 16) t(x)
    """,
    "gas_cc": """
        SELECT x % 2 AS comp, count(*) AS n_nodes
        FROM range(0, 16) t(x) GROUP BY x % 2
    """,
    "gas_sssp": """
        SELECT 'urn:g:' || CAST(x AS VARCHAR) AS node,
               CAST((x * 13) % 16 AS DOUBLE) AS dist
        FROM range(0, 16) t(x)
    """,
    "fast_count": """
        SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
        UNION ALL
        SELECT 'orders' AS tbl, count(*) AS n FROM orders
    """,
    "gas_cc_derived": """
        WITH RECURSIVE nodes AS (
          SELECT DISTINCT user_id % 150 AS n FROM events
        ), e AS (
          SELECT DISTINCT user_id % 150 AS a, (user_id % 150 * 7 + 3) % 150 AS b
          FROM events
        ), sym AS (
          SELECT a, b FROM e UNION SELECT b, a FROM e
        ), reach(src, dst) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
        )
        SELECT src AS node, min(dst) AS component
        FROM reach GROUP BY src
    """,
    "gas_pagerank": """
        SELECT 'urn:g:' || CAST(x AS VARCHAR) AS node, CAST(1.0 AS DOUBLE) AS rank
        FROM range(0, 16) t(x)
    """,
    "gas_bfs_large": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT a, (4*a + r) % 2000 AS b
          FROM (SELECT event_id % 2000 AS a FROM events),
               (VALUES (0),(1),(2),(3)) t(r)
        ), walk(node, depth) AS (
          SELECT 0, 0
          UNION
          SELECT e.b, w.depth + 1 FROM walk w JOIN e ON w.node = e.a
          WHERE w.depth < 8
        )
        SELECT node, CAST(min(depth) AS BIGINT) AS depth
        FROM walk GROUP BY node
    """,
    "gas_sssp_large": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT a, (4*a + r) % 2000 AS b,
                 CAST(1 + (a % 3) AS DOUBLE) AS w
          FROM (SELECT event_id % 2000 AS a FROM events),
               (VALUES (0),(1),(2),(3)) t(r)
        ), walk(node, dist, hops) AS (
          SELECT 0, CAST(0 AS DOUBLE), 0
          UNION
          SELECT e.b, w.dist + e.w, w.hops + 1 FROM walk w JOIN e ON w.node = e.a
          WHERE w.hops < 12 AND w.dist < 12
        )
        SELECT node, min(dist) AS dist FROM walk GROUP BY node
    """,
    "gas_cc_large": """
        WITH e AS (
          SELECT DISTINCT a, ((2*(a//2) + r) % 1000)*2 + (a % 2) AS b
          FROM (SELECT event_id % 2000 AS a FROM events),
               (VALUES (0),(1)) t(r)
        ), n AS (SELECT a FROM e UNION SELECT b AS a FROM e)
        SELECT a AS node, a % 2 AS component FROM n
    """,
    "gas_pagerank_large": """
        WITH e AS (
          SELECT DISTINCT a, (a+7) % 2000 AS b
          FROM (SELECT event_id % 2000 AS a FROM events)
        ), n AS (SELECT a FROM e UNION SELECT b AS a FROM e)
        SELECT a AS node, CAST(1.0 AS DOUBLE) AS rank FROM n
    """,
    "gas_fuzzy_band": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT a, (4*a + r) % 2000 AS b
          FROM (SELECT event_id % 2000 AS a FROM events),
               (VALUES (0),(1),(2),(3)) t(r)
        ), fwd(node, dist) AS (
          SELECT 0, 0
          UNION
          SELECT e.b, f.dist + 1 FROM fwd f JOIN e ON f.node = e.a
          WHERE f.dist < 8
        ), fmin AS (
          SELECT node, MIN(dist) AS dist FROM fwd GROUP BY node
        ), bwd(node, dist) AS (
          SELECT 1234, 0
          UNION
          SELECT e.a, w.dist + 1 FROM bwd w JOIN e ON w.node = e.b
          WHERE w.dist < 8
        ), bmin AS (
          SELECT node, MIN(dist) AS rdist FROM bwd GROUP BY node
        ), dst AS (
          SELECT dist AS d FROM fmin WHERE node = 1234
        ), sp AS (
          SELECT f.node FROM fmin f JOIN bmin b USING (node), dst
          WHERE f.dist + b.rdist = dst.d
        ), band(node, depth) AS (
          SELECT node, 0 FROM sp
          UNION
          SELECT e.b, bd.depth + 1 FROM band bd JOIN e ON bd.node = e.a
          WHERE bd.depth < 8
        ), bandm AS (
          SELECT node, MIN(depth) AS depth FROM band GROUP BY node
        ), cum AS (
          SELECT depth, SUM(COUNT(*)) OVER (ORDER BY depth) AS cum
          FROM bandm GROUP BY depth
        ), cut AS (
          SELECT COALESCE(MIN(depth), 999) AS cut FROM cum WHERE cum >= 600
        )
        SELECT node, CAST(depth AS BIGINT) AS depth
        FROM bandm, cut WHERE depth <= cut.cut
    """,
    "stream_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1, 2
    """,
    "stream_dedup": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "graph_bulk_degree": """
        SELECT CAST(c_nationkey AS VARCHAR) AS nation_id,
               COUNT(*) AS n_members
        FROM customer GROUP BY c_nationkey
    """,
    "changeset_delta": """
        SELECT 'added' AS change,
               'urn:r:' || CAST(r_regionkey AS VARCHAR) AS s,
               'urn:tpch:flag' AS p, 'x' AS o
        FROM region WHERE r_name LIKE 'A%'
        UNION ALL
        SELECT 'removed' AS change,
               'urn:r:' || CAST(r_regionkey AS VARCHAR) AS s,
               'urn:tpch:name' AS p, r_name AS o
        FROM region WHERE r_name LIKE 'A%'
    """,
    "sparql_ask": """
        SELECT 'gt_9990' AS probe,
               EXISTS(SELECT 1 FROM customer WHERE c_acctbal > 9990) AS ask
        UNION ALL
        SELECT 'gt_99999' AS probe,
               EXISTS(SELECT 1 FROM customer WHERE c_acctbal > 99999) AS ask
    """,
    "sparql_subquery": """
        SELECT c_name, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_name ASC LIMIT 5
    """,
    "sparql_bind": """
        SELECT c_name, c_acctbal * 0.1 AS fee
        FROM customer WHERE c_acctbal * 0.1 > 900
    """,
    "sparql_construct": """
        SELECT DISTINCT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS s,
                        'urn:r:' || CAST(n_regionkey AS VARCHAR) AS o
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    "text_chunks": """
        WITH words AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM documents
        )
        SELECT doc_id,
               CAST((i - 1) // 48 AS BIGINT) AS chunk_idx,
               array_to_string(w[i:i+63], ' ') AS chunk,
               CAST(len(w[i:i+63]) AS BIGINT) AS n_tok
        FROM words, UNNEST(range(1, len(w) + 1, 48)) AS t(i)
        ORDER BY doc_id, chunk_idx
    """,
    "decontaminate": """
        WITH words AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
          FROM documents
        ),
        shingles AS (
          SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
          FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
        ),
        bench AS (
          SELECT DISTINCT doc_id AS b_id, sh FROM shingles WHERE doc_id % 10 = 0
        )
        SELECT s.doc_id, COUNT(DISTINCT b.b_id) AS n_bench
        FROM shingles s JOIN bench b USING (sh)
        WHERE s.doc_id % 10 <> 0
        GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    "pii_redact": """
        WITH spiked AS (
          SELECT doc_id,
                 text || ' reach user' || CAST(doc_id % 100 AS VARCHAR)
                      || '@mail.example.com at 10.0.'
                      || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 or 415-555-0142' AS text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
                 AS redacted,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
                 AS n_ips,
               CAST(len(regexp_extract_all(text,
                 '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS BIGINT)
                 AS n_phones
        FROM spiked ORDER BY doc_id
    """,
    "seq_pack": """
        WITH t AS (
          SELECT doc_id,
                 doc_id % 16 AS shard,
                 CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                   AS n_tok
          FROM documents
        ),
        c AS (
          SELECT doc_id, shard, n_tok,
                 SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM t
        )
        SELECT shard,
               CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM c GROUP BY shard, bin ORDER BY shard, bin
    """,
    "text_quality": _TEXT_QUALITY_ORACLE,
    "simhash_pairs": _simhash_oracle(),
    "lsh_cosine_pairs": _lsh_pairs_oracle(),
    "embedding_dedup": _embedding_dedup_oracle(),
    "ivf_topk": _ivf_topk_oracle(),
    "sample_stratified": _sample_stratified_oracle(),
    "sample_quota": """
        WITH ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('q0' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rk
          FROM documents
        )
        SELECT doc_id, source FROM ranked
        WHERE rk <= CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 7
                    ELSE 3 END
    """,
    "vocab_topk": """
        SELECT token, occurrences, doc_freq FROM (
          SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS occurrences,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
                FROM documents)
          GROUP BY 1
        ) ORDER BY occurrences DESC, token ASC LIMIT 50
    """,
    "ngram_jaccard": r"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents WHERE doc_id < 500)
        )
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                       / NULLIF(len(a.shs) + len(b.shs)
                                - len(list_intersect(a.shs, b.shs)), 0),
                       6) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.5
    """,
    # same semantic quantity as ngram_jaccard (exact trigram Jaccard
    # ≥ 0.5, pairs a < b) — the Spark side reaches it via banded
    # MinHash-LSH + exact verify, the oracle quadratically
    "dedup_clusters": r"""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents WHERE doc_id < 500)
        ), pairs AS (
          SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                   / NULLIF(len(a.shs) + len(b.shs)
                            - len(list_intersect(a.shs, b.shs)), 0) AS j
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
          WHERE round(j, 6) >= 0.5
        ), sym AS MATERIALIZED (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ), nodes AS MATERIALIZED (SELECT DISTINCT a AS n FROM sym),
        reach(src, dst) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
        ), comp AS (
          SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
        ), labeled AS (
          SELECT d.doc_id,
                 coalesce(c.component, d.doc_id) AS cluster,
                 length(d.text) AS len
          FROM (SELECT doc_id, text FROM documents WHERE doc_id < 500) d
          LEFT JOIN comp c ON d.doc_id = c.node
        )
        SELECT doc_id, cluster,
               (row_number() OVER (
                  PARTITION BY cluster ORDER BY len DESC, doc_id ASC) = 1
               ) AS keep
        FROM labeled
    """,
    "minhash_pairs": r"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents WHERE doc_id < 500)
        )
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                       / NULLIF(len(a.shs) + len(b.shs)
                                - len(list_intersect(a.shs, b.shs)), 0),
                       6) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.5
    """,
    # replay of the UPDATE sequence as derived relations:
    # base → INSERT DATA → DELETE/INSERT WHERE(o>=2) → grouped count
    "update_roundtrip": """
        WITH after_insert(s, p, o) AS (
          VALUES ('urn:a','urn:p',1),('urn:b','urn:p',2),
                 ('urn:c','urn:p',3),('urn:d','urn:q',4)
        ), matched AS (
          SELECT s, o FROM after_insert WHERE p = 'urn:p' AND o >= 2
        ), final AS (
          SELECT s, p, o FROM after_insert
          WHERE NOT (p = 'urn:p' AND o >= 2)
          UNION ALL
          SELECT s, 'urn:p2', o FROM matched
        )
        SELECT p, count(s) AS n FROM final GROUP BY p
    """,
    # symmetric one-step description of urn:n:5 under the direct
    # mapping: the node's own statements + statements pointing at it
    "sparql_describe": """
        SELECT 'urn:n:5' AS s,
               'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
               'urn:tpch:Nation' AS o
        UNION ALL
        SELECT 'urn:n:5', 'urn:tpch:name', n_name
        FROM nation WHERE n_nationkey = 5
        UNION ALL
        SELECT 'urn:n:5', 'urn:tpch:region', 'urn:r:' || CAST(n_regionkey AS VARCHAR)
        FROM nation WHERE n_nationkey = 5
        UNION ALL
        SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR), 'urn:tpch:nation', 'urn:n:5'
        FROM customer WHERE c_nationkey = 5
        UNION ALL
        SELECT 'urn:s:' || CAST(s_suppkey AS VARCHAR), 'urn:tpch:nation', 'urn:n:5'
        FROM supplier WHERE s_nationkey = 5
    """,
    "stream_sessions": """
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), g AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM g GROUP BY user_id, sid
    """,
    # backward-inclusive as-of: DuckDB's native ASOF LEFT JOIN is the
    # semantic spec the union+window Spark plan must reproduce
    "events_asof": """
        WITH purch AS (
          SELECT event_id,
                 CASE WHEN user_id % 89 <> 0 THEN user_id END AS user_id,
                 ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT CASE WHEN user_id % 89 <> 0 THEN user_id END AS user_id,
                 ts, max_by(value, event_id) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY 1, 2
        )
        SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
               c.click_value, epoch_us(c.ts) AS ts_click_us
        FROM purch p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    # forward as-of: earliest right at-or-after — inequality flipped
    "events_asof_fwd": """
        WITH purch AS (
          SELECT event_id, user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts, max_by(value, event_id) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY 1, 2
        )
        SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
               c.click_value, epoch_us(c.ts) AS ts_click_us
        FROM purch p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    "events_range_join": """
        WITH purch AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               count(c.event_id) AS n_clicks_1h,
               CAST(SUM(CAST(coalesce(c.value, 0) AS DECIMAL(18,6)))
                    AS DOUBLE) AS sum_click_value
        FROM purch p LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts < p.ts
        GROUP BY 1, 2
    """,
    "repetition_stats": """
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents
        ), g AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1]) AS bgs,
                 list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                   AS tgs
          FROM t
        ), e AS (
          SELECT doc_id, unnest(bgs) AS bg FROM g
        ), md AS (
          SELECT doc_id, max(c) AS top_bg FROM (
            SELECT doc_id, bg, count(*) AS c FROM e GROUP BY 1, 2
          ) GROUP BY 1
        )
        SELECT g.doc_id, g.n_tokens,
               CASE WHEN len(bgs) > 0
                    THEN round(top_bg / len(bgs), 6) ELSE 0.0
               END AS top_bigram_frac,
               CASE WHEN len(tgs) > 0
                    THEN round(1.0 - len(list_distinct(tgs)) / len(tgs), 6)
                    ELSE 0.0
               END AS dup_trigram_frac
        FROM g LEFT JOIN md USING (doc_id)
    """,
    "kmeans_cells": _kmeans_oracle(KMEANS_K, KMEANS_ITERS, KMEANS_SCALE),
    # exact-substring duplicate spans: width-8 shingle md5, corpus-wide
    # count >= 2, per-doc interval merge (adjacent windows coalesce)
    "dup_spans": """
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents
        ), occ AS (
          SELECT doc_id,
                 unnest(range(1, len(toks) - 8 + 2)) AS pos,
                 unnest(list_transform(range(1, len(toks) - 8 + 2),
                        i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
          FROM t
        ), hot AS (
          SELECT h FROM occ GROUP BY h HAVING count(*) >= 2
        ), dup AS (
          SELECT doc_id, pos FROM occ JOIN hot USING (h)
        ), grouped AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > coalesce(max(pos + 8) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS new_grp
          FROM dup
        ), g2 AS (
          SELECT doc_id, pos,
                 SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS grp
          FROM grouped
        )
        SELECT doc_id, min(pos) - 1 AS span_start,
               max(pos) - 1 + 8 AS span_end
        FROM g2 GROUP BY doc_id, grp
    """,
}


def _corpus_funnel_oracle() -> str:
    """Funnel oracle COMPOSED from the same oracle fragments the
    individual entries use (text_quality, repetition_stats, dup_spans
    as nested CTE subqueries) — the SQL composes exactly like the
    Spark operators do."""
    return f"""
        WITH tq AS ({_TEXT_QUALITY_ORACLE}),
        rep AS ({ORACLES["repetition_stats"]}),
        ds AS ({ORACLES["dup_spans"]}),
        f AS (
          SELECT tq.doc_id,
                 CASE WHEN tq.lang_guess = 'en' THEN 1 ELSE 0 END AS f1,
                 CASE WHEN tq.quality >= 0.75 THEN 1 ELSE 0 END AS f2,
                 CASE WHEN rep.top_bigram_frac <= 0.06
                      THEN 1 ELSE 0 END AS f3,
                 CASE WHEN dd.doc_id IS NULL THEN 1 ELSE 0 END AS f4
          FROM tq
          JOIN rep ON tq.doc_id = rep.doc_id
          LEFT JOIN (SELECT DISTINCT doc_id FROM ds) dd
            ON tq.doc_id = dd.doc_id
        )
        SELECT 0 AS stage, 'all' AS stage_name,
               CAST(count(*) AS BIGINT) AS n_docs FROM f
        UNION ALL SELECT 1, 'lang_en', CAST(sum(f1) AS BIGINT) FROM f
        UNION ALL SELECT 2, 'quality', CAST(sum(f1 * f2) AS BIGINT) FROM f
        UNION ALL SELECT 3, 'repetition',
                  CAST(sum(f1 * f2 * f3) AS BIGINT) FROM f
        UNION ALL SELECT 4, 'substring_dedup',
                  CAST(sum(f1 * f2 * f3 * f4) AS BIGINT) FROM f
    """


ORACLES["corpus_funnel"] = _corpus_funnel_oracle()


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
