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
