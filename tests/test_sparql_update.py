"""SPARQL UPDATE verbs (reference: AST2BOpUpdate.java:400-458)."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture()
def engine(spark):
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.integer(1)),
            (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.integer(2)),
        ],
    )
    return SparqlEngine(store)


def count(engine):
    return engine.store.df.count()


def test_insert_delete_data(engine):
    engine.update(f"PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:p 3 . ex:d ex:q 4 }}")
    assert count(engine) == 4
    # duplicate insert is a no-op (set semantics)
    engine.update(f"PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:p 3 }}")
    assert count(engine) == 4
    engine.update(f"PREFIX ex: <{EX}> DELETE DATA {{ ex:a ex:p 1 }}")
    assert count(engine) == 3
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ ex:a ex:p 1 }}") is False


def test_modify_where(engine):
    engine.update(f"""PREFIX ex: <{EX}>
        DELETE {{ ?s ex:p ?v }} INSERT {{ ?s ex:p2 ?v }} WHERE {{ ?s ex:p ?v . FILTER(?v > 1) }}""")
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ ex:b ex:p2 2 }}") is True
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ ex:b ex:p 2 }}") is False
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ ex:a ex:p 1 }}") is True


def test_insert_into_graph_and_clear(engine):
    engine.update(f"PREFIX ex: <{EX}> INSERT DATA {{ GRAPH ex:g {{ ex:x ex:y ex:z }} }}")
    res = engine.select(f"PREFIX ex: <{EX}> SELECT ?s WHERE {{ GRAPH ex:g {{ ?s ex:y ex:z }} }}")
    assert res.df.count() == 1
    engine.update("CLEAR DEFAULT")
    assert count(engine) == 1  # only the named-graph triple remains
    engine.update("CLEAR ALL")
    assert count(engine) == 0


def test_copy_move(engine):
    engine.update(f"PREFIX ex: <{EX}> COPY DEFAULT TO ex:g2")
    res = engine.select(f"PREFIX ex: <{EX}> SELECT ?s WHERE {{ GRAPH ex:g2 {{ ?s ex:p ?v }} }}")
    assert res.df.count() == 2
    assert count(engine) == 4
    engine.update(f"PREFIX ex: <{EX}> MOVE ex:g2 TO ex:g3")
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ GRAPH ex:g2 {{ ?s ?p ?o }} }}") is False
    assert engine.ask(f"PREFIX ex: <{EX}> ASK {{ GRAPH ex:g3 {{ ?s ?p ?o }} }}") is True


def test_modify_using(spark):
    """USING restricts the WHERE dataset to the named graph's contents
    read as the default graph (SPARQL 1.1 Update §3.1.3; reference:
    AST2BOpUpdate dataset handling)."""
    g1, g2 = Term.iri(EX + "g1"), Term.iri(EX + "g2")
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.integer(1), g1),
            (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.integer(2), g2),
        ],
    )
    eng = SparqlEngine(store)
    # only g1's statements are visible to the WHERE: b is untouched
    eng.update(
        f"""PREFIX ex: <{EX}>
        INSERT {{ ?s ex:marked true }} USING ex:g1 WHERE {{ ?s ex:p ?v }}"""
    )
    assert eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:a ex:marked true }}") is True
    assert eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:b ex:marked true }}") is False


def test_modify_using_named(spark):
    """USING NAMED scopes which graphs GRAPH patterns may match."""
    g1, g2 = Term.iri(EX + "g1"), Term.iri(EX + "g2")
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.integer(1), g1),
            (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.integer(2), g2),
        ],
    )
    eng = SparqlEngine(store)
    eng.update(
        f"""PREFIX ex: <{EX}>
        INSERT {{ ?s ex:seen ?g }} USING NAMED ex:g2
        WHERE {{ GRAPH ?g {{ ?s ex:p ?v }} }}"""
    )
    assert eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:b ex:seen ex:g2 }}") is True
    assert eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:a ex:seen ?g }}") is False
