"""Versioned commit-point store — transactional UPDATE semantics.

Reference: the journal's commit points and ``CommitOp``
(``bigdata-core/bigdata/src/java/com/bigdata/journal/`` — every commit
produces a new immutable commit point; readers run against the commit
point they opened, the writer appends and then atomically advances the
current root block).

Spark-first translation: each commit writes an immutable parquet
version directory and atomically swaps a commit-pointer file
(write-temp + rename, atomic on local/HDFS filesystems; object stores
need a conditional-put variant).  Readers pin the version directory
they opened — snapshot isolation for free, because published dirs are
never mutated.  Writers use optimistic concurrency: ``commit()``
verifies the head hasn't moved since ``begin()`` (the reference
serializes writers with a lock; OCC is the shared-nothing analog).

Commit layout: ``commit()`` writes a FULL immutable version directory;
``commit_delta()`` writes only the commit's added/removed statements
(one small parquet with an ``op`` column — the tombstone/insert file
pattern) and every ``compact_every``-th version materializes a full
directory again, so reconstruction folds at most ``compact_every - 1``
deltas over the nearest full base.  At 100 TB this is the difference
between a full rewrite per commit and writing kilobytes per commit:
``Transaction`` knows its exact delta from the engine's changeset
tracking, so nothing is ever diffed against the base.  The pointer
file records each version's kind (full/delta/empty); the swap protocol
is unchanged.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

from .sparql.engine import SparqlEngine
from .store import TripleStore


class CommitConflict(Exception):
    """Another transaction committed since this one began."""


class Journal:
    POINTER = "_head.json"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # ------------------------------------------------------------ fs ops
    def _fs(self):
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return jvm, p.getFileSystem(conf)

    def _read_json(self, rel: str) -> dict | None:
        jvm, fs = self._fs()
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{rel}")
        if not fs.exists(p):
            return None
        # bulk copy through the JVM: one py4j transfer for the whole
        # file (a byte-at-a-time stream.read() loop costs one py4j
        # round trip PER BYTE — hundreds of ms per pointer read)
        stream = fs.open(p)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
        return json.loads(bytes(baos.toByteArray()).decode())

    def _write_json_atomic(self, rel: str, obj: dict) -> None:
        jvm, fs = self._fs()
        tmp = jvm.org.apache.hadoop.fs.Path(f"{self.path}/.{rel}.tmp")
        dst = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{rel}")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps(obj).encode()))
        out.close()
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(tmp, dst):
            raise IOError(f"atomic swap failed for {rel}")

    # ---------------------------------------------------------- protocol
    #: delta commits per full materialization (``commit_delta``)
    COMPACT_EVERY = 8

    def head(self) -> int:
        """Current committed version (0 = empty journal)."""
        meta = self._read_json(self.POINTER)
        return int(meta["version"]) if meta else 0

    def _meta(self) -> dict:
        return self._read_json(self.POINTER) or {"version": 0, "kinds": {}}

    def _kinds(self) -> dict:
        """version(str) → 'full' | 'delta' | 'empty'.  Journals written
        before delta commits have no kinds entry: every version full."""
        meta = self._meta()
        kinds = meta.get("kinds")
        if kinds is None:
            kinds = {str(v): "full" for v in range(1, meta["version"] + 1)}
        return kinds

    def _vdir(self, version: int) -> str:
        return f"{self.path}/versions/v{version:08d}"

    def _ddir(self, version: int) -> str:
        return f"{self.path}/deltas/d{version:08d}"

    def open(self, version: int | None = None) -> TripleStore:
        """Snapshot read of a commit point (default: head).  Delta
        versions reconstruct as (nearest full base \\ removes) ∪ adds
        per delta, at most ``COMPACT_EVERY - 1`` folds."""
        from pyspark.sql import functions as F

        v = self.head() if version is None else version
        if v == 0:
            return TripleStore.from_python_triples(self.spark, [])
        kinds = self._kinds()
        base_v = v
        while base_v > 0 and kinds.get(str(base_v), "full") != "full":
            base_v -= 1
        store = (
            TripleStore.load(self.spark, self._vdir(base_v))
            if base_v > 0
            else TripleStore.from_python_triples(self.spark, [])
        )
        for d in range(base_v + 1, v + 1):
            if kinds.get(str(d)) == "empty":
                continue
            delta = self.spark.read.parquet(self._ddir(d))
            removes = delta.where(F.col("op") == 1).drop("op")
            adds = delta.where(F.col("op") == 0).drop("op")
            store = store.remove(removes).add(adds)
        return store

    def commit(
        self,
        store: TripleStore,
        expected_head: int | None = None,
        message: str = "",
        partition_by_predicate: bool = False,
    ) -> int:
        """Write a new commit point and advance the pointer.

        ``expected_head`` enables optimistic concurrency: the commit
        aborts with CommitConflict if another writer advanced the
        journal since the caller read that head.
        """
        cur = self.head()
        if expected_head is not None and cur != expected_head:
            raise CommitConflict(f"head moved: expected v{expected_head}, is v{cur}")
        new = cur + 1
        store.save(self._vdir(new), partition_by_predicate=partition_by_predicate)
        return self._advance(new, "full", expected_head, message)

    def commit_delta(
        self,
        added,
        removed,
        expected_head: int | None = None,
        message: str = "",
        store: TripleStore | None = None,
    ) -> int:
        """Write a new commit point as a DELTA: only the added/removed
        statement frames land on storage (columns of the store layout
        plus ``op`` 0=add 1=remove) — kilobytes for a CRUD commit where
        ``commit()`` rewrites the store.  Callers supply the EXACT
        delta (the engine's changeset tracking knows it; nothing is
        diffed against the base).  Every ``COMPACT_EVERY``-th version
        materializes ``store`` as a full directory instead, bounding
        reconstruction to ``COMPACT_EVERY - 1`` folds; pass ``store``
        whenever available so compaction can fire.  A commit with no
        changes records an 'empty' version (a commit point with no
        file, like the reference's empty commit records)."""
        from .store import _with_ids

        cur = self.head()
        if expected_head is not None and cur != expected_head:
            raise CommitConflict(f"head moved: expected v{expected_head}, is v{cur}")
        new = cur + 1
        if store is not None and new % self.COMPACT_EVERY == 0:
            store.save(self._vdir(new))
            return self._advance(new, "full", expected_head, message)
        from pyspark.sql import functions as F

        parts = []
        if added is not None:
            parts.append(_with_ids(added).withColumn("op", F.lit(0).cast("tinyint")))
        if removed is not None:
            parts.append(_with_ids(removed).withColumn("op", F.lit(1).cast("tinyint")))
        if not parts:
            return self._advance(new, "empty", expected_head, message)
        delta = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        delta.write.mode("overwrite").parquet(self._ddir(new))
        return self._advance(new, "delta", expected_head, message)

    def _advance(
        self, new: int, kind: str, expected_head: int | None, message: str
    ) -> int:
        # re-check before the swap to narrow (not close — OCC, not 2PC)
        # the lost-update window
        if expected_head is not None and self.head() != expected_head:
            raise CommitConflict("head moved during write")
        kinds = self._kinds()
        kinds[str(new)] = kind
        self._write_json_atomic(
            self.POINTER,
            {"version": new, "ts": time.time(), "message": message, "kinds": kinds},
        )
        return new

    def begin(self) -> "Transaction":
        return Transaction(self)

    def durable_engine(self, **engine_kwargs) -> SparqlEngine:
        """A SparqlEngine whose every commit is persisted to this
        journal as a delta commit — the journal-backed namespace shape
        (reference: a Sail over the journal; every connection commit
        lands a commit record).  Opening again after a restart replays
        the head commit point, so the engine's state survives the
        session.

        Single-writer per journal (the reference serializes writers
        the same way): deltas append sequentially with no OCC check.
        The write happens inside the commit (the changeset listener
        runs before the mutation returns), so the statement frames are
        materialized to storage before the engine's own lineage
        compaction could free anything they depend on."""
        engine = SparqlEngine(self.open(), **engine_kwargs)

        def _persist(cs) -> None:
            self.commit_delta(cs.added, cs.removed, store=engine.store)

        engine.add_change_listener(_persist)
        return engine


class Transaction:
    """A read-write transaction: snapshot in, optimistic DELTA commit
    out.

    ``tx.engine`` is a full SparqlEngine over the snapshot — run any
    UPDATE verbs against it; they mutate only the in-memory snapshot
    until ``tx.commit()`` publishes a new commit point.

    The engine's changeset tracking records each update's EXACT
    added/removed statements (checkpointed at delivery — small frames,
    and holding raw lineage across the engine's own compaction would
    dangle on freed snapshots).  ``commit()`` folds them into one net
    (added, removed) pair — later removes cancel earlier adds and vice
    versa — and publishes it through :meth:`Journal.commit_delta`, so
    a CRUD commit writes kilobytes, not the store.
    """

    def __init__(self, journal: Journal):
        self.journal = journal
        self.base_version = journal.head()
        self.engine = SparqlEngine(journal.open(self.base_version))
        self._changesets: list = []
        self.engine.add_change_listener(self._on_changeset)

    def _on_changeset(self, cs) -> None:
        from .operators import lifecycle as L

        self._changesets.append(
            (L.checkpoint(cs.added), L.checkpoint(cs.removed))
        )

    def update(self, text: str) -> None:
        self.engine.update(text)

    def select(self, text: str, **kw):
        return self.engine.select(text, **kw)

    def commit(self, message: str = "") -> int:
        from .changesets import fold_net_delta
        from .operators import lifecycle as L

        net_a, net_r = fold_net_delta(self._changesets)
        try:
            return self.journal.commit_delta(
                net_a,
                net_r,
                expected_head=self.base_version,
                message=message,
                store=self.engine.store,
            )
        finally:
            for a, r in self._changesets:
                L.free(a, r)
            self._changesets = []
