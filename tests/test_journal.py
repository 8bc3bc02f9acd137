"""Transactional UPDATE: commit points, snapshot isolation, optimistic
conflict detection (reference: journal commit points + CommitOp)."""

import pytest

from database_spark.journal import CommitConflict, Journal

EX = "http://example.org/"


def names(engine_or_tx):
    res = engine_or_tx.select(
        f'PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?s ex:name ?n }} ORDER BY ?n'
    )
    return [r["n"]["lex"] for r in res.df.collect()]


@pytest.fixture()
def journal(spark, tmp_path):
    return Journal(spark, str(tmp_path / "journal"))


def test_commit_advances_head_and_persists(journal):
    assert journal.head() == 0
    tx = journal.begin()
    tx.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:a ex:name "Alice" }}')
    assert tx.commit("add alice") == 1
    assert journal.head() == 1

    tx2 = journal.begin()
    tx2.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:b ex:name "Bob" }}')
    assert tx2.commit("add bob") == 2
    assert names(journal.begin()) == ["Alice", "Bob"]


def test_snapshot_isolation_reader_pins_version(journal):
    tx = journal.begin()
    tx.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:a ex:name "Alice" }}')
    tx.commit()

    reader = journal.begin()  # pins v1
    writer = journal.begin()
    writer.update(f'PREFIX ex: <{EX}> DELETE DATA {{ ex:a ex:name "Alice" }}')
    writer.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:name "Cara" }}')
    writer.commit()

    # the reader still sees its snapshot; a fresh tx sees the new head
    assert names(reader) == ["Alice"]
    assert names(journal.begin()) == ["Cara"]


def test_optimistic_conflict_detected(journal):
    tx = journal.begin()
    tx.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:a ex:name "Alice" }}')
    tx.commit()

    t1 = journal.begin()
    t2 = journal.begin()
    t1.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:b ex:name "Bob" }}')
    t2.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:name "Cara" }}')
    t1.commit()
    with pytest.raises(CommitConflict):
        t2.commit()
    # retry on the new head succeeds
    t3 = journal.begin()
    t3.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:name "Cara" }}')
    t3.commit()
    assert names(journal.begin()) == ["Alice", "Bob", "Cara"]


def test_time_travel_read(journal):
    tx = journal.begin()
    tx.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:a ex:name "Alice" }}')
    tx.commit()
    tx = journal.begin()
    tx.update(f'PREFIX ex: <{EX}> DELETE DATA {{ ex:a ex:name "Alice" }}')
    tx.commit()

    from database_spark.sparql.engine import SparqlEngine

    old = SparqlEngine(journal.open(version=1))
    assert names(old) == ["Alice"]
    assert names(journal.begin()) == []
