"""Commit-delta change sets (changesets API).

Reference surface: ``bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/
changesets/IChangeLog.java`` + ``InMemChangeLog.java`` — per-commit
notification of the statements actually added to / removed from the
store, consumed downstream by incremental indexers, cache invalidation
and replication.  The reference fires one ``IChangeRecord`` per
statement; the Spark-native shape is one **ChangeSet of DataFrames per
commit** (an ``update()`` call), which a subscriber can stream to a
sink, join, or aggregate without the driver ever materializing the
delta row-by-row.

Semantics match ``InMemChangeLog``:

* ``added``   — statements that were NOT in the store before the commit
  and are present after it (an INSERT of a pre-existing statement
  reports nothing, like the reference's index-write check).
* ``removed`` — statements that WERE in the store before the commit and
  are absent after it.  With truth maintenance enabled this includes
  inferred statements retracted by DRed, and a deleted explicit
  statement that survives as an inference shows up in ``removed`` (the
  explicit row) and ``added`` (the inferred row) — the reference's
  UPDATED(StatementEnum demotion) pair.

Scale design: deltas are computed from the per-operation candidate
sets (semi/anti joins of the bounded candidates against one scan of
the store), never from a full before/after store diff — cost is
O(candidates + one store scan per mutation op), the same order as the
mutation itself.  Tracking only runs while at least one listener is
subscribed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ChangeSet:
    """One commit's delta: term-struct DataFrames with columns
    ``st, pt, ot, gt`` (gt null = default graph) and ``inferred``."""

    added: DataFrame
    removed: DataFrame


def _key_anti(a: DataFrame, b: DataFrame) -> DataFrame:
    """Rows of ``a`` whose (s,p,o,g) key is absent from ``b``
    (null-safe on g: NULL g = default graph)."""
    from pyspark.sql import functions as F

    from .store import _with_ids

    a, b = _with_ids(a), _with_ids(b)
    keys = b.select(
        F.col("s").alias("__ks"), F.col("p").alias("__kp"),
        F.col("o").alias("__ko"), F.col("g").alias("__kg"),
    )
    cond = (
        (F.col("s") == F.col("__ks"))
        & (F.col("p") == F.col("__kp"))
        & (F.col("o") == F.col("__ko"))
        & F.col("g").eqNullSafe(F.col("__kg"))
    )
    return a.join(keys, cond, "left_anti")


def fold_net_delta(pairs: list) -> tuple:
    """Fold an ordered sequence of per-commit (added, removed) frame
    pairs into ONE net (added, removed) pair with replay semantics
    ``(base \\ removed) ∪ added``: a later add revives an earlier
    remove, a later remove cancels an earlier add.  A remove of a
    never-in-base statement may remain in the net removed set — it is
    a harmless no-op at replay.  Returns (None, None) for an empty
    sequence.  Used by journal delta commits and read-write
    transaction publication."""
    net_a = net_r = None
    for a, r in pairs:
        from .store import _with_ids

        a, r = _with_ids(a), _with_ids(r)
        net_a = a if net_a is None else _key_anti(net_a, r).unionByName(a)
        net_r = r if net_r is None else _key_anti(net_r, a).unionByName(r)
    return net_a, net_r
