"""PII redaction (pipeline/clean.py) and sequence packing
(pipeline/pack.py) — unit edge cases beyond the oracle entries."""

import pytest

from pyspark.sql import functions as F


def test_redact_pii_patterns(spark):
    from database_spark.pipeline.clean import pii_frame

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org or x@y.io end"),
            (2, "call 415-555-0142 or 415.555.0143 now"),
            (3, "host 10.0.0.1 peer 192.168.255.254"),
            (4, "clean text, no pii at all"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_frame(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_ips"] == 0
    assert got[1]["redacted"] == "mail <EMAIL> or <EMAIL> end"
    assert got[2]["n_phones"] == 2
    assert got[2]["redacted"] == "call <PHONE> or <PHONE> now"
    assert got[3]["n_ips"] == 2
    assert got[3]["redacted"] == "host <IP> peer <IP>"
    assert got[4]["redacted"] == "clean text, no pii at all"
    assert (
        got[4]["n_emails"] == got[4]["n_ips"] == got[4]["n_phones"] == 0
    )
    assert got[5]["redacted"] == "" and got[5]["n_emails"] == 0


def test_redact_order_email_digits_not_misparsed(spark):
    """An email whose local part looks dotted-quad-ish must count as
    email (counts are on the original text; redaction order scrubs
    emails before the IP pass touches anything)."""
    from database_spark.pipeline.clean import pii_frame

    docs = spark.createDataFrame(
        [(1, "u1.2.3.4@example.com and real 10.1.2.3")],
        "doc_id long, text string",
    )
    r = pii_frame(docs).collect()[0]
    assert r["n_emails"] == 1
    assert "<EMAIL>" in r["redacted"] and "<IP>" in r["redacted"]
    assert "@" not in r["redacted"]


def test_pack_greedy_bins_respect_budget(spark):
    from database_spark.pipeline.pack import pack_greedy, pack_summary

    # one shard (shards=1), 6 docs of 4 tokens each, budget 8 → bins
    # of exactly two docs
    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(6)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bin"]
        for r in pack_greedy(docs, budget=8, shards=1).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}
    summary = {
        (r["shard"], r["bin"]): (r["n_docs"], r["n_tokens"])
        for r in pack_summary(docs, budget=8, shards=1).collect()
    }
    assert summary == {(0, 0): (2, 8), (0, 1): (2, 8), (0, 2): (2, 8)}


def test_pack_greedy_oversized_doc_overflows_own_bin(spark):
    from database_spark.pipeline.pack import pack_greedy

    docs = spark.createDataFrame(
        [(0, "x " * 3), (1, "y " * 20), (2, "z " * 3)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bin"], r["n_tok"])
        for r in pack_greedy(docs, budget=8, shards=1).collect()
    }
    # doc 1 (20 tokens > budget) starts bin 0's overflow; doc 2 starts
    # after the cumulative 23 tokens → bin floor(23/8) = 2
    assert got[0] == (0, 3)
    assert got[1] == (0, 20)
    assert got[2] == (2, 3)


def test_pack_shards_are_independent(spark):
    from database_spark.pipeline.pack import pack_greedy

    docs = spark.createDataFrame(
        [(i, "t " * 4) for i in range(8)], "doc_id long, text string"
    )
    rows = pack_greedy(docs, budget=8, shards=4).collect()
    # doc_id % 4 sharding: each shard gets ids (k, k+4) → one bin each
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    assert set(by_shard) == {0, 1, 2, 3}
    assert all(sorted(v) == [0, 0] for v in by_shard.values())
