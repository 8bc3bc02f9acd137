"""Property check: random add/remove sequences against a Python
set-model, verified on EVERY layout copy.

The layout-preserving mutation path (r10 missing #1 — the reference
maintains every index permutation per write, ``SPORelation.java``)
rests on two invariants this test attacks with random operation
sequences over a small term universe:

1. every layout copy (primary p-bucketed, ``_s_index``, ``_o_index``,
   ``_g_index``) holds exactly the model's statement set after any
   sequence of adds/removes (set semantics: re-inserting an existing
   statement is a no-op, removing then re-adding revives it);
2. a save + reload mid-sequence (re-bucketing the family) changes
   nothing about subsequent mutations.

Quads included: half the universe carries a named graph, so the
g-layout's named-rows-only maintenance is exercised too.
"""

from __future__ import annotations

import random

import pytest

from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"

SCHEMA = (
    "st struct<kind:tinyint,lex:string,dt:string,lang:string>, "
    "pt struct<kind:tinyint,lex:string,dt:string,lang:string>, "
    "ot struct<kind:tinyint,lex:string,dt:string,lang:string>, "
    "gt struct<kind:tinyint,lex:string,dt:string,lang:string>"
)


def _universe(rng: random.Random, size: int) -> list:
    """Small statement universe; ~half quads, integer + IRI objects."""
    out = []
    for i in range(size):
        s = Term.iri(EX + f"s{rng.randrange(8)}")
        p = Term.iri(EX + f"p{rng.randrange(4)}")
        o = (
            Term.integer(rng.randrange(6))
            if rng.random() < 0.5
            else Term.iri(EX + f"s{rng.randrange(8)}")
        )
        g = Term.iri(EX + f"g{rng.randrange(3)}") if rng.random() < 0.5 else None
        out.append((s, p, o, g))
    return out


def _frame(spark, stmts):
    return spark.createDataFrame(
        [
            (s.as_row(), p.as_row(), o.as_row(), g.as_row() if g else None)
            for s, p, o, g in stmts
        ],
        SCHEMA,
    )


def _key(t):
    s, p, o, g = t
    return (s.lex, p.lex, o.lex, o.dt or "", g.lex if g else "")


def _bag(df):
    rows = df.select("st", "pt", "ot", "gt").collect()
    return sorted(
        (
            r["st"]["lex"],
            r["pt"]["lex"],
            r["ot"]["lex"],
            r["ot"]["dt"] or "",
            r["gt"]["lex"] if r["gt"] else "",
        )
        for r in rows
    )


@pytest.mark.parametrize("seed", [7, 42])
def test_random_mutations_match_set_model_on_every_layout(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    universe = _universe(rng, 60)
    # start from a saved (4-layout) store over a third of the universe
    init = {_key(t): t for t in universe[:20]}
    path = str(tmp_path / f"prop{seed}")
    TripleStore.from_python_triples(
        spark, [tuple(x for x in t if x is not None) for t in init.values()]
    ).save(path, partition_by_predicate=True, buckets=8)
    store = TripleStore.load(spark, path)
    model = dict(init)

    for step in range(6):
        batch = [universe[rng.randrange(len(universe))] for _ in range(5)]
        if rng.random() < 0.5:
            store = store.add(_frame(spark, batch))
            model.update({_key(t): t for t in batch})
        else:
            store = store.remove(_frame(spark, batch))
            for t in batch:
                model.pop(_key(t), None)
        if step == 3:
            # mid-sequence re-bucket: save + reload, then keep mutating
            p2 = str(tmp_path / f"prop{seed}_resave")
            store.save(p2, partition_by_predicate=True, buckets=8)
            store = TripleStore.load(spark, p2)
            assert store.s_df is not None and store.o_df is not None

    want = sorted(_key(t) for t in model.values())
    assert _bag(store.df) == want, "primary layout diverged from model"
    assert store.s_df is not None and _bag(store.s_df) == want
    assert store.o_df is not None and _bag(store.o_df) == want
    named = sorted(k for k in want if k[4] != "")
    if store.g_df is not None:
        assert _bag(store.g_df) == named


def test_nondeterministic_mutation_frame_cannot_desync_layouts(
    spark, tmp_path
):
    """A mutation frame whose CONTENT is nondeterministic (an RDD that
    drops a random row per evaluation) must still leave every layout
    copy identical: the frame is pinned once before the per-layout
    union/anti-join branches consume it (the same hazard class as the
    r10 range_join two-branch bug, closed in store._pin_delta_frame).
    Without the pin, primary/_s_index/_o_index would each see a
    DIFFERENT row subset."""
    path = str(tmp_path / "nd")
    base = [
        (Term.iri(EX + f"s{i}"), Term.iri(EX + f"p{i % 3}"), Term.integer(i))
        for i in range(20)
    ]
    TripleStore.from_python_triples(spark, base).save(
        path, partition_by_predicate=True, buckets=8
    )
    store = TripleStore.load(spark, path)

    new = [
        (
            Term.iri(EX + f"n{i}").as_row(),
            Term.iri(EX + "pz").as_row(),
            Term.integer(1000 + i).as_row(),
            None,
        )
        for i in range(10)
    ]

    def drop_one(it):
        import random

        rows = list(it)
        if rows:
            rows.pop(random.randrange(len(rows)))  # unseeded, per-eval
        return iter(rows)

    rdd = spark.sparkContext.parallelize(new, 1).mapPartitions(drop_one)
    frame = spark.createDataFrame(rdd, SCHEMA)
    mutated = store.add(frame)
    want = _bag(mutated.df)
    assert len(want) == 29  # 20 base + 9 survivors of the dropped row
    assert _bag(mutated.s_df) == want
    assert _bag(mutated.o_df) == want
    # removal with a nondeterministic key frame: same invariant
    removed = mutated.remove(frame)
    want2 = _bag(removed.df)
    assert _bag(removed.s_df) == want2
    assert _bag(removed.o_df) == want2
