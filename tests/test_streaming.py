"""Structured Streaming surface: windowed aggs, sessionization,
NT-line streaming ingest, custom stateful operator."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from database_spark.sources.parquet import read_parquet
from database_spark.streaming.ingest import (
    append_to_store,
    parse_nt_lines,
    running_user_counts,
    stream_nt_directory,
)
from database_spark.streaming.windows import (
    dedup_stream,
    hourly_event_stats,
    run_available_now,
    sessionize,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbspark-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def events_static(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="dbspark-events-")
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    ev.coalesce(2).write.mode("overwrite").parquet(d + "/data")
    yield d + "/data"
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch_hourly(spark, events_static, events_dir, tmpdir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = hourly_event_stats(stream)
    q = run_available_now(agg, "hourly_test", tmpdir + "/cp")
    got = spark.table("hourly_test")
    want = hourly_event_stats(events_static)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    q.stop()


def test_sessionize_batch(spark, events_static):
    s = sessionize(events_static, gap="30 minutes")
    rows = s.collect()
    assert len(rows) > 0
    by_user = s.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    totals = {r["user_id"]: r["n"] for r in by_user}
    base = {
        r["user_id"]: r["n"]
        for r in events_static.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert totals == base  # sessions partition each user's events


def test_parse_nt_lines(spark):
    lines = spark.createDataFrame(
        [
            ('<urn:a> <urn:p> <urn:b> .',),
            ('<urn:a> <urn:name> "Alice" .',),
            ('<urn:a> <urn:note> "hi"@en .',),
            ('<urn:a> <urn:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .',),
            ('_:b1 <urn:p> _:b2 .',),
            ('# comment line',),
            ('',),
        ],
        "value string",
    )
    out = parse_nt_lines(lines).collect()
    assert len(out) == 5
    kinds = sorted((r["st"]["kind"], r["ot"]["kind"]) for r in out)
    assert kinds == [(0, 0), (0, 2), (0, 2), (0, 2), (1, 1)]
    lit = [r for r in out if r["ot"]["lex"] == "30"][0]
    assert lit["ot"]["dt"].endswith("integer")
    lang = [r for r in out if r["ot"]["lex"] == "hi"][0]
    assert lang["ot"]["lang"] == "en"


def test_dedup_stream_drops_watermark_window_duplicates(spark, events_static, tmpdir):
    """Doubled source through dropDuplicatesWithinWatermark == the
    distinct static relation; static input takes the batch path."""
    dup_dir = tmpdir + "/dup"
    events_static.unionByName(events_static).coalesce(2).write.parquet(dup_dir)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(dup_dir)
    out = dedup_stream(stream, ["event_id"]).select("event_id", "value")
    q = run_available_now(out, "sdup_t", tmpdir + "/cp_sdup")
    q.stop()
    got = spark.table("sdup_t")
    assert got.count() == events_static.count()
    assert got.select("event_id").distinct().count() == got.count()
    # batch path: same helper, plain dropDuplicates
    batch = dedup_stream(events_static.unionByName(events_static), ["event_id"])
    assert batch.count() == events_static.count()


def test_streaming_nt_ingest(spark, tmpdir):
    src = tmpdir + "/nt"
    os.makedirs(src)
    with open(src + "/part1.nt", "w") as f:
        f.write('<urn:a> <urn:p> <urn:b> .\n<urn:b> <urn:p> <urn:c> .\n')
    with open(src + "/part2.nt", "w") as f:
        f.write('<urn:c> <urn:name> "see" .\n# noise\n')
    trips = stream_nt_directory(spark, src)
    q = append_to_store(trips, tmpdir + "/store", tmpdir + "/cp2")
    q.awaitTermination()
    stored = spark.read.parquet(tmpdir + "/store")
    assert stored.count() == 3
    assert set(stored.columns) >= {"s", "p", "o", "st", "pt", "ot"}


def test_running_user_counts_stateful(spark, events_dir, tmpdir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    counts = running_user_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", tmpdir + "/cp3")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("running_counts")
    # last update per user == total count per user
    final = (
        got.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    )
    base = {
        r["user_id"]: r["n"]
        for r in spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {r["user_id"]: r["n"] for r in final} == base
    q.stop()
