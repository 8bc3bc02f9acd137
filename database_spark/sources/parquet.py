"""Parquet source with schema-compat shims.

Analog of the reference's pluggable RIO loaders (`DataLoader.java:90`)
for columnar inputs: one entry point that papers over physical-type
quirks a large heterogeneous lake will contain.  Today that is one
shim: pyarrow/pandas writers emit TIMESTAMP(NANOS) columns, which
Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL).  We
re-read them as int64 nanos (`spark.sql.legacy.parquet.nanosAsLong`)
and convert to native TimestampType (µs) columns — lossy below the
microsecond, which SQL semantics never observe.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nanos_columns(path: str) -> list[str]:
    """Column names with TIMESTAMP(NANOS) physical type (footer-only peek)."""
    try:
        schema = pq.read_schema(path)
    except Exception:  # directory dataset / remote path — let Spark handle it
        return []
    out = []
    for name in schema.names:
        t = schema.field(name).type
        if str(t) == "timestamp[ns]":
            out.append(name)
    return out


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """TIMESTAMP without UTC-adjustment metadata (isAdjustedToUTC=false,
    e.g. pandas/pyarrow `timestamp[us]`) loads as TimestampNTZType; the
    engine's SQL semantics (and every oracle comparison) use the
    session-local TimestampType, so normalize — the wall-clock fields
    are preserved verbatim."""
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.parquet` that tolerates nanosecond timestamps."""
    nanos = _nanos_columns(path)
    if not nanos:
        return _normalize_ntz(spark.read.parquet(path))
    prev = spark.conf.get(NANOS_CONF, "false")
    spark.conf.set(NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
        # force schema resolution while the conf is active
        df.schema
    finally:
        spark.conf.set(NANOS_CONF, prev)
    for c in nanos:
        # integer div — epoch nanos overflow double's 53-bit mantissa,
        # so float division here would be off by ±1 µs
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _normalize_ntz(df)
