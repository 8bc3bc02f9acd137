"""Driver-contract sanity: entry() runs, queries()/oracle_sql() keys
line up, and a sample of queries produces stable schemas at sf0.001."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    # every query is either oracle-checked or intentionally rows-only
    assert len(q) >= 15


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"r_name", "num_cust"}


def test_sample_queries_run_sf0001(spark, sf_dir):
    for name in ("sparql_bgp_join", "pricing_summary", "similarity_topk"):
        df = E.queries()[name](spark, sf_dir)
        assert df.count() >= 0
        assert df.columns  # stable, non-empty schema


def test_nanos_timestamp_source(spark, sf_dir):
    from database_spark.sources.parquet import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0
