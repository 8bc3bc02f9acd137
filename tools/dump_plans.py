"""Dump `.explain("formatted")` for entries into plans/<tag>/.

Usage: python tools/dump_plans.py <outdir> <suffix> [entry ...]
Writes plans/<outdir>/<entry>_<suffix>.txt for each selected entry
(default: every entry).  The judge checks plan claims against these.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from database_spark.operators import lifecycle as L
from database_spark.session import get_spark


def main() -> None:
    outdir, suffix, *only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", outdir)
    os.makedirs(base, exist_ok=True)
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(base, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        L.sweep(spark)
        print("wrote", name, flush=True)


if __name__ == "__main__":
    main()
