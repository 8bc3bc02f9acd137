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

At 100 TB each version is a full rewrite here; the production upgrade
path is delta commits (base + tombstone/insert files, compacted
periodically) with the same pointer-swap protocol — the API below
doesn't change.
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
        stream = fs.open(p)
        data = bytearray()
        b = stream.read()
        while b >= 0:
            data.append(b)
            b = stream.read()
        stream.close()
        return json.loads(bytes(data).decode())

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
    def head(self) -> int:
        """Current committed version (0 = empty journal)."""
        meta = self._read_json(self.POINTER)
        return int(meta["version"]) if meta else 0

    def _vdir(self, version: int) -> str:
        return f"{self.path}/versions/v{version:08d}"

    def open(self, version: int | None = None) -> TripleStore:
        """Snapshot read of a commit point (default: head)."""
        v = self.head() if version is None else version
        if v == 0:
            return TripleStore.from_python_triples(self.spark, [])
        return TripleStore.load(self.spark, self._vdir(v))

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
        # re-check before the swap to narrow (not close — OCC, not 2PC)
        # the lost-update window
        if expected_head is not None and self.head() != expected_head:
            raise CommitConflict("head moved during write")
        self._write_json_atomic(
            self.POINTER,
            {"version": new, "ts": time.time(), "message": message},
        )
        return new

    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """A read-write transaction: snapshot in, optimistic commit out.

    ``tx.engine`` is a full SparqlEngine over the snapshot — run any
    UPDATE verbs against it; they mutate only the in-memory snapshot
    until ``tx.commit()`` publishes a new commit point.
    """

    def __init__(self, journal: Journal):
        self.journal = journal
        self.base_version = journal.head()
        self.engine = SparqlEngine(journal.open(self.base_version))

    def update(self, text: str) -> None:
        self.engine.update(text)

    def select(self, text: str, **kw):
        return self.engine.select(text, **kw)

    def commit(self, message: str = "") -> int:
        return self.journal.commit(
            self.engine.store, expected_head=self.base_version, message=message
        )
