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
