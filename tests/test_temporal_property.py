"""Property-style equivalence for operators/temporal.py: on seeded
random event tables, asof_join and range_join must produce exactly the
bag a naive per-row Python oracle computes — including equal-timestamp
ties, keys missing on one side, tolerance cutoffs, numeric (non-
timestamp) time columns, and negative times (bucket floor must round
toward -inf, not truncate toward zero)."""

from __future__ import annotations

import random

from database_spark.operators.temporal import asof_join, range_join


def _tables(rng, keys=4, nl=40, nr=40, tmax=100, tmin=0):
    left = [
        (i, rng.randrange(keys), float(rng.randrange(tmin, tmax)))
        for i in range(nl)
    ]
    seen = set()
    right = []
    for i in range(nr):
        k, t = rng.randrange(keys), float(rng.randrange(tmin, tmax))
        if (k, t) in seen:  # as-of right side must be unique per (k,ts)
            continue
        seen.add((k, t))
        right.append((100 + i, k, t, float(i)))
    return left, right


def _brute_asof(left, right, tol=None):
    out = {}
    for lid, lk, lt in left:
        best = None
        for rid, rk, rt, rv in right:
            if rk == lk and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        if best is not None and tol is not None and lt - best[0] > tol:
            best = None
        out[lid] = best
    return out


def _brute_range(left, right, lo, hi):
    out = set()
    for lid, lk, lt in left:
        for rid, rk, rt, rv in right:
            if rk == lk and (lt - hi) <= rt < (lt - lo):
                out.add((lid, rid))
    return out


def test_asof_join_matches_brute_force(spark):
    rng = random.Random(1234)
    for trial in range(4):
        tol = rng.choice([None, 5.0, 20.0])
        left, right = _tables(rng)
        l = spark.createDataFrame(left, "id long, k long, ts double")  # noqa: E741
        r = spark.createDataFrame(right, "rid long, k long, ts double, v double")
        got = {
            row["id"]: (row["ts_right"], row["v"])
            for row in asof_join(
                l, r, on="k", right_cols=["v"], tolerance_s=tol
            ).collect()
        }
        want = _brute_asof(left, right, tol)
        for lid, best in want.items():
            if best is None:
                assert got[lid] == (None, None), (trial, lid)
            else:
                assert got[lid] == best, (trial, lid)


def test_range_join_matches_brute_force(spark):
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    rng = random.Random(5678)
    for trial in range(4):
        lo = float(rng.choice([0, 3, 10]))
        hi = lo + float(rng.choice([7, 15, 40]))
        # include negative times: floor(-x / width) must round toward
        # -inf for the candidate buckets to line up
        left, right = _tables(rng, tmin=-50, tmax=50)
        l = spark.createDataFrame(left, "id long, k long, ts double")  # noqa: E741
        r = spark.createDataFrame(right, "rid long, k long, ts double, v double")
        got = {
            (row["l_id"], row["r_rid"])
            for row in range_join(
                l, r, on="k", lower_s=lo, upper_s=hi
            ).collect()
        }
        assert got == _brute_range(left, right, lo, hi), (trial, lo, hi)


def _brute_asof_fwd(left, right, tol=None):
    out = {}
    for lid, lk, lt in left:
        best = None
        for rid, rk, rt, rv in right:
            if rk == lk and rt >= lt and (best is None or rt < best[0]):
                best = (rt, rv)
        if best is not None and tol is not None and best[0] - lt > tol:
            best = None
        out[lid] = best
    return out


def test_asof_forward_matches_brute_force(spark):
    rng = random.Random(9012)
    for trial in range(3):
        tol = rng.choice([None, 7.0])
        left, right = _tables(rng)
        l = spark.createDataFrame(left, "id long, k long, ts double")  # noqa: E741
        r = spark.createDataFrame(right, "rid long, k long, ts double, v double")
        got = {
            row["id"]: (row["ts_right"], row["v"])
            for row in asof_join(
                l, r, on="k", right_cols=["v"], tolerance_s=tol,
                direction="forward",
            ).collect()
        }
        for lid, best in _brute_asof_fwd(left, right, tol).items():
            assert got[lid] == (best if best else (None, None)), (trial, lid)
