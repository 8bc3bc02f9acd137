"""Named subqueries: WITH { SELECT ... } AS %name + INCLUDE %name.

Blazegraph extension (reference: NamedSubqueryRoot / INCLUDE,
HTreeNamedSubqueryOp.java:77, NamedSubqueryInclude.java); the
double-optional-include.rq fixture shape is mirrored here."""

import pytest
from pyspark.sql import functions as F

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def iri(x):
    return Term.iri(EX + x)


@pytest.fixture(scope="module")
def engine(spark):
    x, y = iri("x"), iri("y")
    trips = [
        (iri("a1"), x, Term.integer(1)),
        (iri("a1"), y, Term.integer(10)),
        (iri("a2"), x, Term.integer(2)),
        (iri("a3"), y, Term.integer(30)),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    store = TripleStore(spark, store.df.localCheckpoint())
    return SparqlEngine(store)


def rows(res, *vars_):
    out = []
    for r in res.df.collect():
        out.append(tuple(r[v]["lex"] if r[v] is not None else None for v in vars_))
    return sorted(out)


def test_named_subquery_double_optional(engine):
    # mirror of double-optional-include.rq: two named sets, each joined
    # optionally — a1 has both, a2 only x; a3 (y only) does NOT appear
    # because the second OPTIONAL left-joins onto {a1,a2} (this matches
    # the reference's double-optional-include.srx semantics)
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?a ?x ?y
        WITH {{ SELECT ?a ?x {{ ?a ex:x ?x }} }} AS %set1
        WITH {{ SELECT ?a ?y {{ ?a ex:y ?y }} }} AS %set2
        WHERE {{
          OPTIONAL {{ INCLUDE %set1 }} .
          OPTIONAL {{ INCLUDE %set2 }} .
        }}""")
    assert rows(res, "a", "x", "y") == [
        (EX + "a1", "1", "10"),
        (EX + "a2", "2", None),
    ]


def test_named_subquery_reused_twice_single_compute(engine):
    # the same named set INCLUDEd twice under different join contexts
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?a ?x
        WITH {{ SELECT ?a ?x {{ ?a ex:x ?x }} }} AS %xs
        WHERE {{
          INCLUDE %xs .
          {{ SELECT (COUNT(*) AS ?n) WHERE {{ INCLUDE %xs }} }}
          FILTER(?n = 2)
        }}""")
    assert rows(res, "a", "x") == [(EX + "a1", "1"), (EX + "a2", "2")]


def test_include_external_solution_set(engine, spark):
    # include_01.rq style: the harness installs the named set
    from pyspark.sql.types import StructField, StructType

    from database_spark import terms as T

    schema = StructType([StructField("z", T.TERM_TYPE, True)])
    df = spark.createDataFrame(
        [(Term.integer(7).as_row(),), (Term.integer(8).as_row(),)], schema
    )
    res = engine.select(
        "SELECT ?z WHERE { INCLUDE %ext }", named_sets={"ext": df}
    )
    assert rows(res, "z") == [("7",), ("8",)]


def test_unknown_solution_set_raises(engine):
    from database_spark.sparql.compiler import SparqlCompileError

    with pytest.raises(SparqlCompileError, match="unknown solution set"):
        engine.select("SELECT ?z WHERE { INCLUDE %nope }")
