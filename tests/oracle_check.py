"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side (default
sf0.01), compare row-count + column names + order-insensitive values.

Usage: python tests/oracle_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as E
from database_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    # --json PATH: also write an ORACLE_LOCAL-style machine record
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            record[name] = {"status": "fail", "err": f"{type(ex).__name__}: {ex}"}
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        sql = E.oracle_sql().get(name)
        if sql is None:
            record[name] = {
                "status": "pass",
                "rows": len(got),
                "sec": round(time.time() - t0, 1),
                "rows_only": True,
            }
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        want = con.sql(sql).df()
        g, w = canon(got), canon(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} != {list(w.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True
                )
            except AssertionError as ex:
                status.append("values differ: " + str(ex).split("\n")[0])
                # show a sample mismatch
                mask = (g.astype(str) != w.astype(str)).any(axis=1)
                if mask.any():
                    i = mask.idxmax()
                    print("  spark:", g.loc[i].to_dict())
                    print("  duck :", w.loc[i].to_dict())
        if status:
            failures.append(name)
            record[name] = {"status": "fail", "err": "; ".join(status)}
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            record[name] = {
                "status": "pass",
                "rows": len(g),
                "sec": round(time.time() - t0, 1),
                "rows_only": False,
            }
            print(f"ok   {name}: rows={len(g)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json as _json

        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf": sf,
                    "generated_by": (
                        "tests/oracle_check.py (full local run)"
                        if not only
                        else "tests/oracle_check.py (selected entries: "
                        + ", ".join(sorted(only))
                        + ")"
                    ),
                    "total": len(record),
                    "pass": sum(1 for r in record.values() if r["status"] == "pass"),
                    "fail": len(failures),
                    "results": record,
                },
                f,
                indent=1,
            )
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
