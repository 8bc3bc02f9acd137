"""Block-manager lifecycle for iterative operators.

``df.localCheckpoint()`` materializes the plan into block-manager
storage and Spark never frees those blocks until the session dies.  An
iterative operator that checkpoints per round therefore leaks one block
set per round, and a long-lived session (a 44-query bench, or a 100 TB
service) accumulates storage pressure that slows every later job —
exactly the 4-5x GAS-family regression observed in round 2.

These helpers give every checkpoint an owner:

* :func:`checkpoint` — ``localCheckpoint`` that records which persistent
  RDD ids it created (stashed on the returned DataFrame object).
* :func:`free` — unpersist those ids (non-blocking).  Safe and
  idempotent: no-op for plain DataFrames or already-freed ones.  NEVER
  free a checkpoint a still-needed DataFrame depends on — checkpointing
  truncates lineage, so the data cannot be recomputed.
* :func:`protect` — mark a checkpoint session-lifetime (cached stores)
  so :func:`sweep` keeps it.
* :func:`sweep` — unpersist every non-protected persistent RDD in the
  session.  Call between queries AFTER the previous result has been
  fully consumed (bench.py does); results freed by sweep cannot be
  re-collected.

Reference parity note: the reference's query engine releases native
buffers per-query through ``IRunningQuery`` lifecycle hooks; this module
is the Spark-side analog for driver-loop operators that sidestep
Catalyst's own resource management.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_ATTR = "_dbspark_ckpt_ids"
_PROTECTED: set[int] = set()
#: serializes the before→after persistent-RDD-id diff in
#: :func:`checkpoint`.  Without it, two threads checkpointing
#: concurrently (a writer's compaction + a tx view's changeset
#: capture, as in the server soak) can each swallow the OTHER's new
#: ids into their ownership set — a later free() of one then
#: unpersists the other's blocks, killing every reader of that
#: snapshot with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
_CKPT_LOCK = threading.Lock()


def _jmap(sc):
    return sc._jsc.getPersistentRDDs()


def _ids(sc) -> set[int]:
    return {int(k) for k in _jmap(sc).keySet().toArray()}


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + remember the persistent RDD ids it created.

    The id attribution is a before→after diff of the session's
    persistent-RDD map, serialized under ``_CKPT_LOCK`` so concurrent
    checkpoints from other threads cannot leak their ids into this
    ownership set (see the lock's comment).  A concurrent plain
    ``persist()`` from another thread can still be swallowed — that
    mis-frees a RECOMPUTABLE cache (a perf hiccup), never a
    lineage-truncated checkpoint."""
    sc = df.sparkSession.sparkContext
    with _CKPT_LOCK:
        before = _ids(sc)
        out = df.localCheckpoint(eager=eager)
        setattr(out, _ATTR, _ids(sc) - before)
    return out


def free(*dfs) -> None:
    """Release the checkpoint blocks owned by each DataFrame (if any).

    PROTECTED ids are skipped as a second line of defense: even if an
    ownership set was polluted, a session-lifetime artifact (a store
    compaction snapshot) can only be freed via
    :func:`unprotect_and_free`, which de-protects first."""
    for df in dfs:
        if df is None:
            continue
        ids = getattr(df, _ATTR, None)
        if not ids:
            continue
        sc = df.sparkSession.sparkContext
        jmap = _jmap(sc)
        for i in ids:
            if i in _PROTECTED:
                continue
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)
        setattr(df, _ATTR, set())


def protect(df: DataFrame) -> DataFrame:
    """Exempt a checkpointed DataFrame's blocks from :func:`sweep`."""
    _PROTECTED.update(getattr(df, _ATTR, ()))
    return df


def protected_checkpoint(df: DataFrame) -> DataFrame:
    """checkpoint + protect, for session-lifetime cached artifacts."""
    return protect(checkpoint(df))


def unprotect_and_free(df) -> None:
    """Drop a previously protected checkpoint: un-exempt its blocks
    from :func:`sweep` and unpersist them (store-compaction rotation)."""
    if df is None:
        return
    _PROTECTED.difference_update(getattr(df, _ATTR, ()))
    free(df)


def sweep(spark) -> int:
    """Unpersist every non-protected persistent RDD; returns count.

    Only safe once all non-protected checkpointed DataFrames from prior
    queries have been consumed (their data is NOT recomputable).
    """
    sc = spark.sparkContext
    jmap = _jmap(sc)
    n = 0
    for i in list(_ids(sc)):
        if i in _PROTECTED:
            continue
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
            n += 1
    return n
