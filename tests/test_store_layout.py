"""Predicate-partitioned layout: partition pruning must reach the scan
(the Spark analog of the reference's POS index choice)."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture(scope="module")
def saved_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "pp")
    trips = [
        (Term.iri(EX + f"s{i}"), Term.iri(EX + f"p{i % 7}"), Term.integer(i))
        for i in range(200)
    ]
    TripleStore.from_python_triples(spark, trips).save(
        path, partition_by_predicate=True, buckets=16
    )
    return TripleStore.load(spark, path)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_meta_roundtrip(saved_store):
    assert saved_store.p_buckets == 16
    assert "p_bucket" in saved_store.df.columns


def test_bound_predicate_scan_prunes_partitions(saved_store):
    eng = SparqlEngine(saved_store)
    res = eng.select(
        f'PREFIX ex: <{EX}> SELECT ?s ?o WHERE {{ ?s ex:p3 ?o }}'
    )
    plan = _formatted_plan(res.df)
    # the p_bucket equality must appear as a PartitionFilter, not a
    # post-scan condition
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "p_bucket" in pf_line
    # and the p equality is pushed to parquet
    assert any(
        "PushedFilters" in l and "EqualTo(p," in l for l in plan.splitlines()
    )
    # correctness unchanged
    assert len(res.df.collect()) == len([i for i in range(200) if i % 7 == 3])


def test_mutation_drops_layout_column(spark, saved_store):
    extra = spark.createDataFrame(
        [
            (
                Term.iri(EX + "new").as_row(),
                Term.iri(EX + "p1").as_row(),
                Term.integer(999).as_row(),
                None,
            )
        ],
        "st struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "pt struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "ot struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "gt struct<kind:tinyint,lex:string,dt:string,lang:string>",
    )
    bigger = saved_store.add(extra)
    assert "p_bucket" not in bigger.df.columns
    assert bigger.df.count() == 201


# ------------------------------------------------- subject-keyed layout
# The OSP/SPO-permutation analog (SPOKeyOrder.java:90-128): save()
# writes a second, s_bucket-partitioned copy; the compiler reads it for
# unbound-predicate patterns so bound/join-bound subjects prune.


def test_s_index_meta_roundtrip(saved_store):
    assert saved_store.s_buckets == 16
    assert saved_store.s_df is not None
    assert "s_bucket" in saved_store.s_df.columns


def test_bound_subject_unbound_predicate_prunes(spark, saved_store):
    eng = SparqlEngine(saved_store)
    res = eng.select(
        f'PREFIX ex: <{EX}> SELECT ?p ?o WHERE {{ ex:s5 ?p ?o }}'
    )
    plan = _formatted_plan(res.df)
    # the s_bucket equality must be a PARTITION filter on the s-layout
    assert any(
        "PartitionFilters" in l and "s_bucket" in l for l in plan.splitlines()
    ), plan
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["o"]["lex"] == "5"


def test_join_bound_subject_nps_gets_dynamic_pruning(spark, saved_store):
    """`?s ex:p3 ?o . ?s !(ex:p0|ex:p1) ?x` — the negated-property-set
    scan must read the subject layout and carry a dynamic-partition-
    pruning filter fed by the bound-p sibling pattern (the as-bound
    PipelineJoin access-path probe)."""
    eng = SparqlEngine(saved_store)
    res = eng.select(
        f'PREFIX ex: <{EX}> SELECT ?s ?o ?x WHERE {{ '
        f'?s ex:p3 ?o . ?s !(ex:p0|ex:p1) ?x }}'
    )
    plan = _formatted_plan(res.df)
    assert any(
        "PartitionFilters" in l and "s_bucket" in l for l in plan.splitlines()
    ), plan
    assert "dynamicpruning" in plan, plan
    rows = res.df.collect()
    # each p3 subject has exactly one edge (its own p3), so x == o
    expected = [i for i in range(200) if i % 7 == 3]
    assert len(rows) == len(expected)
    assert all(r["o"]["lex"] == r["x"]["lex"] for r in rows)


def test_s_layout_results_match_unpartitioned(spark, saved_store):
    """Layout choice must never change results: the same queries on an
    in-memory (unsaved, single-layout) copy of the store."""
    mem = TripleStore(spark, saved_store._flat(), has_named=False)
    for q in (
        f'PREFIX ex: <{EX}> SELECT ?p ?o WHERE {{ ex:s7 ?p ?o }}',
        f'PREFIX ex: <{EX}> SELECT ?s ?x WHERE {{ '
        f'?s ex:p2 ?o . ?s !(ex:p0) ?x }}',
    ):
        got = sorted(
            tuple((v["lex"] if v else None) for v in r)
            for r in SparqlEngine(saved_store).select(q).df.collect()
        )
        want = sorted(
            tuple((v["lex"] if v else None) for v in r)
            for r in SparqlEngine(mem).select(q).df.collect()
        )
        assert got == want


def test_probe_methods_use_s_layout(saved_store):
    s5 = Term.iri(EX + "s5")
    assert saved_store.count_pattern(s=s5) == 1
    assert saved_store.has_statement(s=s5)
    assert not saved_store.has_statement(s=Term.iri(EX + "nope"))


def test_as_bound_probe_pushes_static_inset_and_memoizes(spark, saved_store):
    """The as-bound access-path probe (PipelineJoin semantics): a small
    outer side's subject ids must land in the s-layout scan as STATIC
    IN filters — s_bucket INSET as a partition filter (plus the id IN
    for row-group pruning on the (s,p,o) sort) — and the id collect
    must be memoized so recompiling the same query runs zero jobs."""
    from database_spark.sparql.compiler import Compiler

    eng = SparqlEngine(saved_store)
    q = (
        f'PREFIX ex: <{EX}> SELECT ?s ?o ?x WHERE {{ '
        f'?s ex:p4 ?o . ?s !(ex:p0|ex:p1) ?x }}'
    )
    res = eng.select(q)
    plan = _formatted_plan(res.df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "s_bucket" in l]
    assert pf and "INSET" in pf[0], plan  # static partition prune
    assert "EqualTo(p," not in pf[0]
    # memoization: a recompile of the same query submits no probe jobs
    sc = spark.sparkContext
    sc.setJobGroup("asbound-recompile", "x")
    try:
        eng.select(q)
    finally:
        sc.setJobGroup(None, None)
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("asbound-recompile")
    assert len(jobs) == 0, f"recompile ran {len(jobs)} jobs"


# ------------------------------------------------- object-keyed layout
# The OSP analog: bound-o / unbound-p-and-s reverse lookups prune to
# one o_bucket directory.


def test_o_index_meta_roundtrip(saved_store):
    assert saved_store.o_buckets == 16
    assert saved_store.o_df is not None
    assert "o_bucket" in saved_store.o_df.columns


def test_reverse_lookup_prunes_o_bucket(spark, saved_store):
    eng = SparqlEngine(saved_store)
    # integer literal 5 appears as exactly one object (s5 p5 5)
    res = eng.select(
        'SELECT ?s ?p WHERE { ?s ?p 5 }'
    )
    plan = _formatted_plan(res.df)
    assert any(
        "PartitionFilters" in l and "o_bucket" in l for l in plan.splitlines()
    ), plan
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["s"]["lex"].endswith("s5")


def test_o_layout_results_match_unpartitioned(spark, saved_store):
    mem = TripleStore(spark, saved_store._flat(), has_named=False)
    q = 'SELECT ?s ?p WHERE { ?s ?p 7 }'
    got = sorted(
        tuple((v["lex"] if v else None) for v in r)
        for r in SparqlEngine(saved_store).select(q).df.collect()
    )
    want = sorted(
        tuple((v["lex"] if v else None) for v in r)
        for r in SparqlEngine(mem).select(q).df.collect()
    )
    assert got == want and len(got) == 1


def test_probe_methods_use_o_layout(saved_store):
    assert saved_store.count_pattern(o=Term.integer(5)) == 1
    assert saved_store.has_statement(o=Term.integer(5))
    assert not saved_store.has_statement(o=Term.integer(5000))


def test_mutation_invalidates_aux_layouts(spark, saved_store):
    """add/remove produce in-memory stores WITHOUT the saved aux
    layouts (re-save to re-bucket) — a mutated store must never serve
    stale s-/o-layout data for unbound-predicate queries."""
    from database_spark.store import _with_ids

    extra = spark.createDataFrame(
        [
            (
                Term.iri(EX + "s5").as_row(),
                Term.iri(EX + "brandnew").as_row(),
                Term.integer(4242).as_row(),
                None,
            )
        ],
        "st struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "pt struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "ot struct<kind:tinyint,lex:string,dt:string,lang:string>, "
        "gt struct<kind:tinyint,lex:string,dt:string,lang:string>",
    )
    mutated = saved_store.add(extra)
    assert mutated.s_df is None and mutated.o_df is None
    # bound-s unbound-p star expansion sees the NEW edge
    rows = SparqlEngine(mutated).select(
        f'PREFIX ex: <{EX}> SELECT ?p ?o WHERE {{ ex:s5 ?p ?o }}'
    ).df.collect()
    lex = sorted(r["o"]["lex"] for r in rows)
    assert "4242" in lex and len(rows) == 2
    # removal drops the original edge for the reverse lookup too
    removed = saved_store.remove(
        spark.createDataFrame(
            [
                (
                    Term.iri(EX + "s5").as_row(),
                    Term.iri(EX + "p5").as_row(),
                    Term.integer(5).as_row(),
                    None,
                )
            ],
            extra.schema,
        )
    )
    assert removed.s_df is None and removed.o_df is None
    got = SparqlEngine(removed).select(
        'SELECT ?s WHERE { ?s ?p 5 }'
    ).df.collect()
    assert got == []


@pytest.mark.parametrize("seed", [11, 23])
def test_layout_choice_never_changes_results_property(spark, tmp_path, seed):
    """Property check over random small graphs: for every triple-pattern
    shape (bound/unbound s, p, o in all combinations, plus an NPS), the
    three-layout saved store and the single-DataFrame in-memory store
    return the same bag of solutions.  Guards the scan_pattern index
    choice (p-/s-/o-layout + as-bound IN pushdown) as a whole."""
    import random

    rng = random.Random(seed)
    trips = []
    for _ in range(120):
        s = Term.iri(EX + f"n{rng.randrange(12)}")
        p = Term.iri(EX + f"q{rng.randrange(4)}")
        o = (
            Term.iri(EX + f"n{rng.randrange(12)}")
            if rng.random() < 0.5
            else Term.integer(rng.randrange(6))
        )
        trips.append((s, p, o))
    path = str(tmp_path / f"prop{seed}")
    store = TripleStore.from_python_triples(spark, trips)
    store.save(path, partition_by_predicate=True, buckets=8)
    saved = TripleStore.load(spark, path)
    mem = TripleStore(spark, saved._flat(), has_named=False)
    queries = [
        'SELECT ?p ?o WHERE { <%sn3> ?p ?o }' % EX,          # bound s
        'SELECT ?s ?p WHERE { ?s ?p <%sn4> }' % EX,          # bound o
        'SELECT ?s ?o WHERE { ?s <%sq1> ?o }' % EX,          # bound p
        'SELECT ?s ?p ?o WHERE { ?s ?p ?o }',                # open scan
        'SELECT ?s ?p WHERE { ?s ?p 3 }',                    # bound literal o
        'SELECT ?x WHERE { <%sn3> ?p ?x . ?x ?p2 ?y }' % EX, # chained unbound p
        'PREFIX ex: <%s> SELECT ?s ?o WHERE { ?s ex:q0 ?m . ?s !(ex:q0) ?o }'
        % EX,                                                # NPS join
    ]
    for q in queries:
        def bag(eng):
            return sorted(
                tuple((v["lex"] if v else None) for v in r)
                for r in eng.select(q).df.collect()
            )
        got, want = bag(SparqlEngine(saved)), bag(SparqlEngine(mem))
        assert got == want, (q, len(got), len(want))
