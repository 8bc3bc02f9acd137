"""Read-side snapshot pinning (found by the r8 concurrency soak):
a reader whose plan references compaction snapshot S must survive a
concurrent writer pushing the engine through further compactions —
without the pin, compaction frees S's checkpoint blocks and the
reader's job dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND."""

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def _commit_n(eng, n, tag):
    for i in range(n):
        eng.update(f'INSERT DATA {{ <{EX}{tag}{i}> <{EX}p> "{i}" }}')


def test_pinned_read_survives_compactions(spark):
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    # push past the first compaction so a snapshot exists
    _commit_n(eng, eng._COMPACT_EVERY, "seed")
    assert eng._compact_snapshot is not None
    with eng.read_pin():
        snap = eng._compact_snapshot
        df = eng.select("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }").df
        # a full compaction cycle lands while the read is in flight
        _commit_n(eng, eng._COMPACT_EVERY, "mid")
        assert eng._compact_snapshot is not snap  # compaction happened
        # the old snapshot was DEFERRED, not freed — the read still works
        assert id(snap) in eng._deferred_snaps
        rows = df.collect()
        assert rows[0][0]["lex"] == str(eng._COMPACT_EVERY)
    # pin released → deferred snapshot freed
    assert id(snap) not in eng._deferred_snaps
    assert not eng._read_pins


def test_tx_view_pin_defers_snapshot_after_commit_ends_tx(spark):
    """A &timestamp= reader streaming on a tx view keeps the tx's
    snapshot alive even if the tx is ENDED mid-read: the view's pin
    targets the owner engine's registry."""
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    _commit_n(eng, eng._COMPACT_EVERY, "seed")
    txid = eng.begin_read_tx()
    view = eng.tx_view(txid)
    snap = eng._tx[txid]["snap"]
    with view.read_pin():
        # the tx ends and enough commits land to retire its snapshot
        eng.end_tx(txid)
        _commit_n(eng, eng._COMPACT_EVERY, "mid")
        if id(snap) in eng._deferred_snaps:
            # still deferred because the read pin holds it
            assert id(snap) in eng._read_pins
        # the view still reads its frozen commit point
        n = view.select("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }").df.collect()
        assert n[0][0]["lex"] == str(eng._COMPACT_EVERY)
    assert not eng._read_pins


def test_active_read_protects_later_snapshots(spark):
    """A pinned reader's LATER queries root at whatever snapshot is
    current when they compile — so while any unisolated read is in
    flight, NO snapshot may be freed, not just the one captured at pin
    time (r8 advice: the pin must not leave a window where a snapshot
    the reader's plan references is freed mid-stream)."""
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    _commit_n(eng, eng._COMPACT_EVERY, "seed")
    with eng.read_pin():
        # a compaction lands mid-read; the NEXT query roots at snap2
        _commit_n(eng, eng._COMPACT_EVERY, "mid1")
        snap2 = eng._compact_snapshot
        df = eng.select("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }").df
        # another cycle retires snap2 — it is NOT pinned by this
        # reader, but the active read must defer its free anyway
        _commit_n(eng, eng._COMPACT_EVERY, "mid2")
        assert eng._compact_snapshot is not snap2
        assert id(snap2) in eng._deferred_snaps
        rows = df.collect()  # would die if snap2's blocks were freed
        assert rows[0][0]["lex"] == str(2 * eng._COMPACT_EVERY)
    # last pin exit sweeps every deferred snapshot
    assert not eng._deferred_snaps and eng._active_reads == 0


def test_nested_and_concurrent_pins_refcount(spark):
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    _commit_n(eng, eng._COMPACT_EVERY, "seed")
    snap = eng._compact_snapshot
    with eng.read_pin():
        with eng.read_pin():
            assert eng._read_pins[id(snap)][1] == 2
        assert eng._read_pins[id(snap)][1] == 1
        _commit_n(eng, eng._COMPACT_EVERY, "mid")
        assert id(snap) in eng._deferred_snaps
    assert id(snap) not in eng._deferred_snaps


def test_concurrent_checkpoint_ownership_disjoint(spark):
    """lifecycle.checkpoint attributes created RDD ids by a
    before/after diff; under concurrency that window must be
    serialized or one thread's free() unpersists another thread's
    (even protected) snapshot — the root cause behind the soak's
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND cascade."""
    import threading

    from database_spark.operators import lifecycle as L

    owned: dict = {}
    errs: list = []

    def worker(tag):
        try:
            dfs = []
            for i in range(6):
                df = L.checkpoint(
                    spark.range(200).selectExpr(f"id + {i} as v")
                )
                dfs.append(df)
            owned[tag] = set().union(
                *[getattr(d, "_dbspark_ckpt_ids") for d in dfs]
            )
            for d in dfs:
                assert d.count() == 200  # own blocks are alive
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    tags = list(owned)
    for a in range(len(tags)):
        for b in range(a + 1, len(tags)):
            assert not (owned[tags[a]] & owned[tags[b]]), (
                "ownership sets overlap: a free() would kill a "
                "sibling's checkpoint"
            )


def test_free_never_touches_protected_ids(spark):
    from database_spark.operators import lifecycle as L

    snap = L.protected_checkpoint(spark.range(100).selectExpr("id as v"))
    # pollute another frame's ownership set with the protected id
    victim = L.checkpoint(spark.range(50).selectExpr("id as w"))
    getattr(victim, "_dbspark_ckpt_ids").update(
        getattr(snap, "_dbspark_ckpt_ids")
    )
    L.free(victim)
    assert snap.count() == 100  # protected blocks survived the bad free
    L.unprotect_and_free(snap)  # proper rotation still frees them
