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
