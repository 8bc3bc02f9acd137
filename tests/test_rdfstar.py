"""RDF* / statement identifiers end-to-end: TriG-star data in,
<< s p o >> query patterns out (reference: SIDs mode — SPO.java
statement identifiers, VTE.STATEMENT; SURVEY §1.4 sid=hash(s,p,o))."""

import pytest

from database_spark.rio.reader import TurtleParser
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore

EX = "http://example.org/"

DATA = f"""
@prefix ex: <{EX}> .
ex:alice ex:age 30 .
<< ex:alice ex:age 30 >> ex:source ex:census ;
                         ex:confidence 9 .
<< ex:bob ex:age 25 >> ex:source ex:survey .
"""


@pytest.fixture(scope="module")
def engine(spark):
    quads = TurtleParser(DATA).parse()
    rows = [
        (s.as_row(), p.as_row(), o.as_row(), g.as_row() if g else None)
        for s, p, o, g in quads
    ]
    from database_spark.rio.reader import TRIPLE_SCHEMA

    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    store = TripleStore.from_term_structs(spark, df)
    store = TripleStore(spark, store.df.localCheckpoint())
    return SparqlEngine(store)


def lex_rows(res):
    return sorted(
        tuple(r[v]["lex"] if r[v] is not None else None for v in res.vars)
        for r in res.df.collect()
    )


def test_constant_embedded_pattern(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?src WHERE {{ << ex:alice ex:age 30 >> ex:source ?src }}""")
    assert lex_rows(res) == [(EX + "census",)]


def test_variable_embedded_pattern(engine):
    # who has an annotated age, and from which source?
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?s ?age ?src
        WHERE {{ << ?s ex:age ?age >> ex:source ?src }}""")
    assert lex_rows(res) == [
        (EX + "alice", "30", EX + "census"),
        (EX + "bob", "25", EX + "survey"),
    ]


def test_embedded_assertion_is_in_graph(engine):
    # << s p o >> in data asserts the base triple (SIDs semantics)
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?s WHERE {{ ?s ex:age ?a }}""")
    assert lex_rows(res) == [(EX + "alice",), (EX + "bob",)]


def test_two_annotations_same_statement(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?c WHERE {{ << ex:alice ex:age 30 >> ex:confidence ?c }}""")
    assert lex_rows(res) == [("9",)]
