"""Standalone worker for the MULTI-PROCESS durable-journal soak
(test_journal_multiprocess.py): its own JVM/SparkSession, hammering one
shared journal dir with OCC transactions until the deadline.

Each successful commit inserts exactly ONE process-unique statement, so
the parent can check global serialization arithmetic: head == total
commits, every version readable, final statement count == head.

Usage: python journal_soak_worker.py <journal_dir> <tag> <seconds> <out_json>
"""

import hashlib
import json
import sys
import time


def main() -> int:
    jdir, tag, seconds, out = (
        sys.argv[1],
        sys.argv[2],
        float(sys.argv[3]),
        sys.argv[4],
    )
    from database_spark.journal import CommitConflict, Journal
    from database_spark.session import get_spark

    spark = get_spark(
        f"journal-soak-{tag}", master="local[2]", shuffle_partitions=2
    )
    j = Journal(spark, jdir)
    deadline = time.time() + seconds
    # a loaded box can starve one JVM out of every OCC race inside the
    # window (each attempt is a multi-second Spark job under
    # contention) — grant a grace period until the worker has landed
    # at least one commit, so the parent's "every worker committed"
    # serialization arithmetic tests the lock, not the scheduler
    hard_cap = deadline + 120
    committed: dict = {}  # version -> subject IRI
    conflicts = 0
    reads = 0
    i = 0
    while time.time() < (deadline if committed else hard_cap):
        subj = f"urn:soak:{tag}:{i}"
        tx = j.begin()
        tx.update(f'INSERT DATA {{ <{subj}> <urn:p> "{tag}" }}')
        try:
            v = tx.commit(f"{tag}#{i}")
        except CommitConflict:
            conflicts += 1
            tx.rollback()
            # jittered backoff: without it a consistently-slow loser
            # re-collides with the same winner forever (livelock).
            # Stable per-worker jitter (md5, not hash(): PYTHONHASHSEED
            # randomizes hash() per process, so workers could land on
            # similar sequences and failures wouldn't reproduce)
            jit = int(hashlib.md5(tag.encode()).hexdigest(), 16)
            time.sleep(0.02 * (1 + (jit + conflicts) % 5))
            continue  # retry the SAME statement in a fresh tx
        committed[v] = subj
        i += 1
        # interleave reads: the head must always reconstruct cleanly
        n = j.open().df.count()
        assert n >= len(committed), (n, len(committed))
        reads += 1
    with open(out, "w") as fh:
        json.dump(
            {"tag": tag, "committed": committed, "conflicts": conflicts,
             "reads": reads},
            fh,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
