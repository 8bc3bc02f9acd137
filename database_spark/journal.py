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
verifies the head hasn't moved since ``begin()``; the check + data
write + pointer swap run under a cross-process lock
(``_commit_lock`` — kernel ``flock`` locally, atomic
``createNewFile`` on HDFS), so two processes sharing a journal path
cannot both advance (the reference serializes writers with the
journal's write lock).

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

import contextlib
import json
import os
import time

from pyspark.sql import SparkSession

from .sparql.engine import SparqlEngine
from .store import TripleStore


class CommitConflict(Exception):
    """Another transaction committed since this one began."""


class CommitLockTimeout(CommitConflict):
    """Could not acquire the cross-process writer lock in time.

    A CommitConflict subclass on purpose: callers already handle
    writer contention as CommitConflict (retry / surface 409), and a
    busy lock IS writer contention — one failure type for both."""


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

    # ---------------------------------------------------------- locking
    LOCKFILE = "_commit.lock"
    #: a lock older than this is presumed orphaned by a DEAD process
    #: and broken.  Generous on purpose: the lock is held across the
    #: data write, and a full materialization of a large store can
    #: legitimately take many minutes — breaking a LIVE writer's lock
    #: would let two writers interleave, the exact bug the lock closes.
    LOCK_STALE_SECS = 3600.0

    @contextlib.contextmanager
    def _commit_lock(self, timeout: float = 30.0, stale: float | None = None):
        """Cross-process writer mutex: an atomically-created lock file
        held across data write + pointer swap, so two PROCESSES sharing
        a journal path cannot interleave between the head re-check and
        the pointer rename (the reference serializes writers on the
        journal's write lock; within one process the engine's write
        lock already serializes).  Local paths use POSIX
        ``O_CREAT|O_EXCL`` (truly atomic); remote filesystems use
        ``FileSystem.createNewFile`` (atomic on HDFS).

        Local paths: ``fcntl.flock`` on a persistent lock file — the
        KERNEL owns the lock state, so a crashed holder's lock releases
        automatically and no staleness heuristic exists to misfire
        (a naive mtime-based break has a TOCTOU where two waiters both
        break the same stale lock, or steal a freshly re-acquired one).
        Remote filesystems keep the create-file protocol with an
        atomic-RENAME stale break (exactly one racer's rename wins)."""
        if stale is None:
            stale = self.LOCK_STALE_SECS
        local = not ("://" in self.path and not self.path.startswith("file:"))
        lock_path = f"{self.path.removeprefix('file:')}/{self.LOCKFILE}"
        deadline = time.time() + timeout
        if local:
            import fcntl

            os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
            fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
            try:
                while True:
                    try:
                        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                        break
                    except OSError:
                        if time.time() > deadline:
                            raise CommitLockTimeout(
                                f"journal commit lock busy: {lock_path}"
                            )
                        time.sleep(0.02)
                os.ftruncate(fd, 0)
                os.write(fd, f"{os.getpid()} {time.time()}".encode())
                yield
            finally:
                with contextlib.suppress(OSError):
                    fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)
        else:
            jvm, fs = self._fs()
            hpath = jvm.org.apache.hadoop.fs.Path
            p = hpath(f"{self.path}/{self.LOCKFILE}")
            while not fs.createNewFile(p):
                try:
                    # racer may delete/rename the lock between the
                    # failed create and this probe — a vanished file
                    # just means retry the acquire loop
                    st = fs.getFileStatus(p) if fs.exists(p) else None
                except Exception:
                    # a PERSISTENT probe failure (RPC/permission) must
                    # still hit the deadline + backoff — bare `continue`
                    # would hot-spin createNewFile forever (advice r8)
                    if time.time() > deadline:
                        raise CommitLockTimeout(
                            f"journal commit lock busy: {p}"
                        )
                    time.sleep(0.05)
                    continue
                if st is not None and (
                    time.time() - st.getModificationTime() / 1000 > stale
                ):
                    # atomic break: HDFS rename fails for all but one
                    # racer once the source is gone
                    broken = hpath(
                        f"{self.path}/{self.LOCKFILE}.broken.{time.time_ns()}"
                    )
                    if fs.rename(p, broken):
                        fs.delete(broken, False)
                    continue
                if time.time() > deadline:
                    raise CommitLockTimeout(f"journal commit lock busy: {p}")
                time.sleep(0.05)
            try:
                yield
            finally:
                fs.delete(p, False)

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
        """version(str) → 'full' | 'delta' | 'empty' for versions the
        pointer still tracks.  Entries at or below the most recent full
        materialization are PRUNED at commit time (head reconstruction
        never folds past the nearest full base), so the pointer stays
        O(COMPACT_EVERY) instead of O(total versions); pruned or
        pre-delta-journal versions resolve via :meth:`_kind_of`'s
        filesystem probe."""
        return self._meta().get("kinds") or {}

    def _kind_of(self, version: int, kinds: dict) -> str:
        """Resolve a version's kind: the pointer's (bounded) kinds map
        first, else probe the immutable version/delta directories —
        pruned history and journals written before delta commits have
        no map entry, but a full version always has its vdir and a
        delta its ddir (an empty commit wrote neither)."""
        k = kinds.get(str(version))
        if k is not None:
            return k
        jvm, fs = self._fs()
        if fs.exists(jvm.org.apache.hadoop.fs.Path(self._vdir(version))):
            return "full"
        if fs.exists(jvm.org.apache.hadoop.fs.Path(self._ddir(version))):
            return "delta"
        return "empty"

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
        while base_v > 0 and self._kind_of(base_v, kinds) != "full":
            base_v -= 1
        store = (
            TripleStore.load(self.spark, self._vdir(base_v))
            if base_v > 0
            else TripleStore.from_python_triples(self.spark, [])
        )
        for d in range(base_v + 1, v + 1):
            if self._kind_of(d, kinds) == "empty":
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
        partition_by_predicate: bool | None = None,
    ) -> int:
        """Write a new commit point and advance the pointer.

        ``partition_by_predicate`` defaults to *derive from the store*
        (None): a layout-carrying store keeps its bucketed layout and
        bucket COUNT, an unpartitioned one saves flat — so the bucketing
        of a version no longer depends on WHICH commit kind materialized
        it (r11 advice #2).  Pass True/False to override.

        ``expected_head`` enables optimistic concurrency: the commit
        aborts with CommitConflict if another writer advanced the
        journal since the caller read that head.  The whole commit
        (head check + data write + pointer swap) runs under the
        cross-process :meth:`_commit_lock`, so a losing racer fails its
        head check BEFORE writing data — it can never clobber the
        winner's version directory (both would target v(head+1)).
        """
        with self._commit_lock():
            cur = self.head()
            if expected_head is not None and cur != expected_head:
                raise CommitConflict(
                    f"head moved: expected v{expected_head}, is v{cur}"
                )
            new = cur + 1
            self._save_full(store, new, partition_by_predicate)
            return self._advance(new, "full", message)

    def _save_full(
        self,
        store: TripleStore,
        version: int,
        partition_by_predicate: bool | None = None,
    ) -> None:
        """The ONE full-materialization path both commit kinds share
        (r11 advice #2): a journal whose base was saved with a
        non-default bucket count used to re-bucket differently depending
        on whether ``commit()`` or a delta compaction materialized the
        version — ``commit()`` fell through to ``save()``'s default 64.
        Both now preserve the store's own bucket count, and a plain
        ``commit()`` of a layout-carrying store keeps its partitioning
        unless the caller explicitly opts out."""
        if partition_by_predicate is None:
            partition_by_predicate = store.p_buckets is not None
        store.save(
            self._vdir(version),
            partition_by_predicate=partition_by_predicate,
            buckets=store.p_buckets or 64,
        )

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

        with self._commit_lock():
            cur = self.head()
            if expected_head is not None and cur != expected_head:
                raise CommitConflict(
                    f"head moved: expected v{expected_head}, is v{cur}"
                )
            new = cur + 1
            if store is not None and new % self.COMPACT_EVERY == 0:
                # a compaction of a layout-carrying store re-buckets all
                # layouts (p/s/o) into fresh pruned parquet — the
                # every-8th cadence that keeps the mutation-preserved
                # layout views (store.add/remove unions) from deepening
                # forever, the analog of the reference maintaining every
                # index permutation across commits (SPORelation.java)
                store.save(
                    self._vdir(new),
                    partition_by_predicate=store.p_buckets is not None,
                    buckets=store.p_buckets or 64,
                )
                return self._advance(new, "full", message)
            from pyspark.sql import functions as F

            parts = []
            if added is not None:
                parts.append(
                    _with_ids(added).withColumn("op", F.lit(0).cast("tinyint"))
                )
            if removed is not None:
                parts.append(
                    _with_ids(removed).withColumn("op", F.lit(1).cast("tinyint"))
                )
            if not parts:
                return self._advance(new, "empty", message)
            delta = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            delta.write.mode("overwrite").parquet(self._ddir(new))
            return self._advance(new, "delta", message)

    def _advance(self, new: int, kind: str, message: str) -> int:
        """Swap the pointer to ``new``.  Callers hold
        :meth:`_commit_lock` across their head check, data write, and
        this swap — the check-then-write window the OCC-only protocol
        had is closed by the lock, not narrowed.

        Kinds-map hygiene: a full materialization prunes every entry
        BELOW it (head reconstruction never folds past the nearest
        full base, and historical ``open()`` resolves pruned versions
        by probing the immutable dirs), so pointer metadata stays
        O(COMPACT_EVERY) instead of growing per commit forever."""
        kinds = self._kinds()
        kinds[str(new)] = kind
        if kind == "full":
            kinds = {v: k for v, k in kinds.items() if int(v) >= new}
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
        """Publish the folded net delta.  The staged changesets are
        freed only on SUCCESS: a ``CommitConflict`` (or any other
        failure) leaves the staging intact, so the transaction's delta
        is not silently lost — the caller can inspect it, replay the
        updates on a fresh transaction, or abort explicitly via
        :meth:`rollback`."""
        from .changesets import fold_net_delta
        from .operators import lifecycle as L

        net_a, net_r = fold_net_delta(self._changesets)
        version = self.journal.commit_delta(
            net_a,
            net_r,
            expected_head=self.base_version,
            message=message,
            store=self.engine.store,
        )
        for a, r in self._changesets:
            L.free(a, r)
        self._changesets = []
        return version

    def rollback(self) -> None:
        """Discard the staged delta (frees the checkpointed changeset
        frames).  The snapshot engine stays readable."""
        from .operators import lifecycle as L

        for a, r in self._changesets:
            L.free(a, r)
        self._changesets = []
