"""Plan-evidence probe for the composite-prefix quad gap (r11 verdict
missing #2 / next-round #4): for the shape ``GRAPH <g> { ?s <p> ?o }``
(predicate AND context bound), how many rows does each existing route
scan versus what a hypothetical (p,g) composite layout would scan?

Routes measured on the quads store (``__spark_entry__._quads_graph``):

* **p-route** (what the compiler picks today): prune the primary
  layout to ``p_bucket = pmod(p)``, filter g row-level.  Scan size =
  rows in the pruned p_bucket partition(s).
* **g-route** (exists but unchosen when p is bound): prune ``_g_index``
  to ``g_bucket = pmod(g)``, filter p row-level.  Scan size = rows in
  the pruned g_bucket partition(s).
* **(p,g) hypothetical**: a composite layout would scan only the rows
  sharing BOTH bucket coordinates — computed here as
  ``count(p_bucket = pmod(p) AND pmod(g) = pmod(g))`` over the same
  data, i.e. the bucket-collision-inclusive row count a fifth layout
  would read.

Output: one JSON line per probed (p, g) pair with scan/match counts and
waste ratios, plus a summary.  Counts only — deterministic, not
wall-clock — because the question is SCAN SIZE at 100 TB, which counts
measure exactly and timing at sf1 does not.

Usage: python tools/probe_pg.py [sf_dir]   (default .testdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata/sf1",
    )
    import __spark_entry__ as E
    from database_spark import terms as T
    from database_spark.session import get_spark

    spark = get_spark("probe-pg")
    spark.sparkContext.setLogLevel("ERROR")
    eng = E._quads_graph(spark, sf_dir)
    store = eng.store
    assert store.p_buckets and store.g_buckets, "quads store must carry layouts"
    pb_n, gb_n = store.p_buckets, store.g_buckets

    pred = T.Term.iri(E.TPCH + "mktsegment")
    pid = T.term_id(T.lit_term(pred))
    named = store.df.where(F.col("g").isNotNull())
    total_named = named.count()

    # every named graph in the store, with its row count (catalog-sized)
    graphs = [
        (r["gt"]["lex"], r["g"], r["cnt"])
        for r in named.groupBy("gt", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    rows_out = []
    for glex, gid, gcnt in sorted(graphs)[:8]:  # 8 representative graphs
        p_part = store.df.where(
            F.col("p_bucket") == F.pmod(pid, F.lit(pb_n))
        )
        g_part = store.g_df.where(
            F.col("g_bucket") == F.pmod(F.lit(gid), F.lit(gb_n))
        )
        scan_p = p_part.count()
        scan_g = g_part.count()
        match = p_part.where(
            (F.col("p") == pid) & (F.col("g") == gid)
        ).count()
        # hypothetical composite (p,g) layout: rows sharing both bucket
        # coordinates (includes bucket-collision rows it would still read)
        scan_pg = store.df.where(
            (F.col("p_bucket") == F.pmod(pid, F.lit(pb_n)))
            & (F.pmod(F.col("g"), F.lit(gb_n)) == F.pmod(F.lit(gid), F.lit(gb_n)))
        ).count()
        rows_out.append(
            {
                "graph": glex,
                "graph_rows": gcnt,
                "match": match,
                "scan_p_route": scan_p,
                "scan_g_route": scan_g,
                "scan_pg_hypothetical": scan_pg,
                "waste_p_route": round(scan_p / max(match, 1), 2),
                "waste_g_route": round(scan_g / max(match, 1), 2),
                "waste_pg": round(scan_pg / max(match, 1), 2),
            }
        )
    summary = {
        "sf_dir": sf_dir,
        "total_named_rows": total_named,
        "n_graphs": len(graphs),
        "p_buckets": pb_n,
        "g_buckets": gb_n,
        "probes": rows_out,
        "median_waste_p_route": sorted(r["waste_p_route"] for r in rows_out)[
            len(rows_out) // 2
        ],
        "median_waste_g_route": sorted(r["waste_g_route"] for r in rows_out)[
            len(rows_out) // 2
        ],
        "median_waste_pg": sorted(r["waste_pg"] for r in rows_out)[
            len(rows_out) // 2
        ],
    }
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
