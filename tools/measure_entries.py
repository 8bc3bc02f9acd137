"""Per-entry measurement harness for the optimization rounds.

For each selected entry: compile wall (driver-side DataFrame
construction, incl. any probe/iteration jobs), exec wall (noop sink),
and the number of Spark JOBS each phase launched (from the status
store) — the direct evidence for barrier-bound entries (guide §1).

Usage: python tools/measure_entries.py [--sf DIR] [--reps N] [entry ...]
Writes one JSON line per entry to stdout and (with --out) a JSON file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from database_spark.operators import lifecycle as L
from database_spark.session import get_spark


def n_jobs(sc) -> int:
    return sc._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    argv = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    reps = 1
    out_path = None
    if "--sf" in argv:
        i = argv.index("--sf"); sf_dir = argv[i + 1]; del argv[i:i + 2]
    if "--reps" in argv:
        i = argv.index("--reps"); reps = int(argv[i + 1]); del argv[i:i + 2]
    if "--out" in argv:
        i = argv.index("--out"); out_path = argv[i + 1]; del argv[i:i + 2]
    only = set(argv)
    spark = get_spark("measure-entries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64, numPartitions=32).mapInPandas(lambda it: it, "id long").count()
    E._graph(spark, sf_dir)
    E._graph(spark, sf_dir).select(
        "SELECT ?s WHERE { ?s a <urn:tpch:Region> } LIMIT 1"
    ).df.write.mode("overwrite").format("noop").save()
    sc = spark.sparkContext
    results: dict = {}
    for rep in range(reps):
        for name, fn in E.queries().items():
            if only and name not in only:
                continue
            j0 = n_jobs(sc)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            j1 = n_jobs(sc)
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            j2 = n_jobs(sc)
            rec = results.setdefault(
                name,
                {"compile": [], "exec": [], "compile_jobs": [], "exec_jobs": []},
            )
            rec["compile"].append(round(t1 - t0, 3))
            rec["exec"].append(round(t2 - t1, 3))
            rec["compile_jobs"].append(j1 - j0)
            rec["exec_jobs"].append(j2 - j1)
            L.sweep(spark)
        spark.sparkContext._jvm.System.gc()
    for name, rec in results.items():
        print(json.dumps({"entry": name, **rec}, separators=(",", ":")))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
