"""Interleaved A/B bench: round-1 entry code vs HEAD, alternating in
ONE window (r11 verdict next-round #5).

Motivation: identical code has measured 78.8-123.6 s across a single
afternoon on this shared VM (documented since r5), which makes
absolute cross-round medians unfalsifiable.  This harness removes the
window variable: it extracts the round-1 tree from git, then runs
``A B A B …`` — one 1-rep bench subprocess per arm per round-robin
turn — so both arms sample the SAME machine conditions.  The
per-entry ratio of medians over the common entries is the canonical
``bench_vs_baseline`` evidence; per-round absolute totals remain what
the driver records.

Each arm gets its own persistent store-cache dir, and each arm runs
one UNMEASURED warmup pass first (the first pass pays the one-time
rdfized-store build + save; every later subprocess loads the bucketed
parquet cache like a steady-state service would).

Usage::

    python tools/bench_ab.py [--reps N] [--out BENCH_AB.json]

Writes the JSON record (default repo-root ``BENCH_AB.json``) and
prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_TAG = "dca8646"  # round 1: verdict/advice/correctness/bench
# --base COMMIT overrides the A arm (e.g. a round's pre-optimization
# HEAD) so within-round before/after ratios ride the same machine
# window as the canonical r1 comparison does.


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def _extract_r1() -> str:
    dst = os.path.join(tempfile.gettempdir(), f"spark_graft_ab_{R1_TAG}")
    marker = os.path.join(dst, ".extracted")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    tar = subprocess.run(
        ["git", "-C", REPO, "archive", R1_TAG],
        check=True,
        stdout=subprocess.PIPE,
    )
    subprocess.run(["tar", "-x", "-C", dst], input=tar.stdout, check=True)
    with open(marker, "w") as fh:
        fh.write(R1_TAG)
    return dst


def _run_arm(cwd: str, cache_dir: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_STORE_CACHE"] = cache_dir
    env.pop("SPARK_GRAFT_BENCH_REPS", None)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        check=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    ).stdout.decode()
    # the bench prints ONE JSON line (possibly after stray log lines)
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {cwd}")


def main() -> int:
    reps = 3
    out_path = os.path.join(REPO, "BENCH_AB.json")
    base_tag = R1_TAG
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if "--base" in sys.argv:
        base_tag = sys.argv[sys.argv.index("--base") + 1]
    globals()["R1_TAG"] = base_tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    r1_dir = _extract_r1()
    arms = {
        "r1": (r1_dir, os.path.join(tempfile.gettempdir(), f"spark_graft_ab_cache_{R1_TAG}")),
        "head": (REPO, os.path.join(tempfile.gettempdir(), "spark_graft_ab_cache_head")),
    }
    t_start = time.time()
    print(f"warmup (unmeasured, builds each arm's store cache) …", flush=True)
    for tag, (cwd, cache) in arms.items():
        _run_arm(cwd, cache, sf_dir)
        print(f"  {tag}: warm", flush=True)

    draws: dict[str, list] = {"r1": [], "head": []}
    for i in range(reps):
        for tag, (cwd, cache) in arms.items():  # strict A B A B interleave
            rec = _run_arm(cwd, cache, sf_dir)
            draws[tag].append(rec)
            print(
                f"rep {i + 1}/{reps} {tag}: total {rec['value']}s",
                flush=True,
            )

    common = sorted(
        set(draws["r1"][0]["queries"]) & set(draws["head"][0]["queries"])
    )
    per_entry = {}
    for q in common:
        a = _median([d["queries"][q] for d in draws["r1"]])
        b = _median([d["queries"][q] for d in draws["head"]])
        per_entry[q] = {
            "r1_median": round(a, 3),
            "head_median": round(b, 3),
            "ratio": round(b / a, 3) if a else None,
        }
    r1_total = round(sum(v["r1_median"] for v in per_entry.values()), 2)
    head_total = round(sum(v["head_median"] for v in per_entry.values()), 2)
    record = {
        "r1_commit": R1_TAG,
        # provenance (r12 advice #4): the A arm is "r1" by KEY but may
        # be any commit via --base; record the resolved commit and
        # whether it is the true round-1 baseline, so archived records
        # from overridden runs are self-describing
        "base_commit": base_tag,
        "base_is_round1": base_tag == "dca8646",
        "sf_dir": sf_dir,
        "reps": reps,
        "interleaving": "strict A/B per rep, one window",
        "window_sec": round(time.time() - t_start, 1),
        "common_entries": len(common),
        "r1_total_common": r1_total,
        "head_total_common": head_total,
        "bench_vs_baseline": round(head_total / r1_total, 3) if r1_total else None,
        "per_entry": per_entry,
        "r1_draw_totals": [d["value"] for d in draws["r1"]],
        "head_draw_totals": [d["value"] for d in draws["head"]],
        "head_total_all_entries_last_draw": draws["head"][-1]["value"],
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(
        f"\nBENCH_AB: {len(common)} common entries, "
        f"r1 {r1_total}s vs head {head_total}s "
        f"=> bench_vs_baseline {record['bench_vs_baseline']}"
    )
    worst = sorted(
        per_entry.items(), key=lambda kv: -(kv[1]["ratio"] or 0)
    )[:5]
    for q, v in worst:
        print(f"  slowest vs r1: {q}: {v['r1_median']} -> {v['head_median']}"
              f" ({v['ratio']}x)")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
