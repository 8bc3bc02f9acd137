"""Regression tests for the round-11 ADVICE.md items.

1. ``__spark_entry__._swap_cache_dir`` — rename-aside publish: the old
   cache is renamed out of the way (atomic) before the new copy lands,
   so no process can observe a half-deleted store dir.
2. ``Journal.commit`` derives partitioning + bucket count from the
   store (the delta-compaction path already did), so a journal's
   bucketing no longer depends on which commit kind materialized a
   version.
3. ``Compiler._bounded_ids`` statically-big skip — covered by
   ``test_store_layout.py::test_bounded_ids_row_gate_fires_for_file_backed_sides``.
4. ``TripleStore._overlaps_source`` — save() checkpoints eagerly only
   for the self-overwrite case.
"""

import os

from database_spark.journal import Journal
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "urn:ex:"


def _mk_store(spark, n=30, preds=4):
    trips = [
        (Term.iri(EX + f"s{i}"), Term.iri(EX + f"p{i % preds}"), Term.integer(i))
        for i in range(n)
    ]
    return TripleStore.from_python_triples(spark, trips)


def test_swap_cache_dir_publishes_and_cleans(tmp_path):
    import __spark_entry__ as E

    path = str(tmp_path / "cache")
    tmp = path + ".build"
    os.makedirs(os.path.join(path, "sub"))
    with open(os.path.join(path, "sub", "f"), "w") as f:
        f.write("old")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "g"), "w") as f:
        f.write("new")
    E._swap_cache_dir(tmp, path)
    assert os.path.isfile(os.path.join(path, "g"))
    assert not os.path.exists(os.path.join(path, "sub"))
    assert not os.path.exists(tmp)
    assert not os.path.exists(path + ".old")
    # fresh publish (no previous copy) also works
    os.makedirs(tmp)
    with open(os.path.join(tmp, "h"), "w") as f:
        f.write("new2")
    E._swap_cache_dir(tmp, str(tmp_path / "cache2"))
    assert os.path.isfile(str(tmp_path / "cache2/h"))


def test_journal_commit_preserves_store_bucket_count(spark, tmp_path):
    base = str(tmp_path / "base_store")
    _mk_store(spark).save(base, partition_by_predicate=True, buckets=8)
    loaded = TripleStore.load(spark, base)
    assert loaded.p_buckets == 8

    journal = Journal(spark, str(tmp_path / "j"))
    journal.commit(loaded)  # derive: partitioned, buckets=8
    meta = TripleStore._read_meta(spark, journal._vdir(1))
    assert meta.get("p_buckets") == 8
    assert meta.get("s_buckets") == 8

    # an unpartitioned store derives to a flat save
    journal2 = Journal(spark, str(tmp_path / "j2"))
    journal2.commit(_mk_store(spark, n=10))
    meta2 = TripleStore._read_meta(spark, journal2._vdir(1))
    assert meta2.get("p_buckets") is None
    # explicit override still wins
    journal3 = Journal(spark, str(tmp_path / "j3"))
    journal3.commit(loaded, partition_by_predicate=False)
    meta3 = TripleStore._read_meta(spark, journal3._vdir(1))
    assert meta3.get("p_buckets") is None


def test_overlaps_source_detection(spark, tmp_path):
    base = str(tmp_path / "ov_store")
    _mk_store(spark).save(base, partition_by_predicate=True, buckets=4)
    loaded = TripleStore.load(spark, base)
    assert loaded._overlaps_source(base) is True
    assert loaded._overlaps_source(str(tmp_path / "elsewhere")) is False
    # in-memory store overlaps nothing
    assert _mk_store(spark, n=5)._overlaps_source(base) is False
    # and a same-path re-save still round-trips (the eager path)
    loaded.save(base, partition_by_predicate=True, buckets=4)
    again = TripleStore.load(spark, base)
    assert again.df.count() == 30
