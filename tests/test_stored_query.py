"""Stored-query SERVICE (StoredQueryService.java analog)."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.sparql.storedquery import (
    register_stored_query,
    unregister_stored_query,
)
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/book/"
DC = "http://purl.org/dc/elements/1.1/"
NS = "http://example.org/ns#"


@pytest.fixture()
def engine(spark):
    trips = [
        (Term.iri(EX + "book1"), Term.iri(DC + "title"), Term.literal("SPARQL Tutorial")),
        (Term.iri(EX + "book1"), Term.iri(NS + "price"), Term.integer(42)),
        (Term.iri(EX + "book2"), Term.iri(DC + "title"), Term.literal("The Semantic Web")),
        (Term.iri(EX + "book2"), Term.iri(NS + "price"), Term.integer(23)),
    ]
    register_stored_query(
        "books",
        f"""PREFIX dc: <{DC}> PREFIX ns: <{NS}>
            SELECT ?book ?title ?price {{
              ?book dc:title ?title ; ns:price ?price .
            }}""",
    )
    yield SparqlEngine(TripleStore.from_python_triples(spark, trips))
    unregister_stored_query("books")


def test_stored_query_with_outer_bindings(engine):
    # BINDINGS flow INTO the stored query (TestStoredQueryService
    # test_stored_query_001 semantics)
    res = engine.select(f"""
        PREFIX bsq: <http://www.bigdata.com/rdf/stored-query#>
        PREFIX : <{EX}>
        SELECT ?book ?title ?price {{
          SERVICE <http://www.bigdata.com/rdf/stored-query#books> {{ }}
        }}
        VALUES ?book {{ :book1 }}""")
    rows = res.df.collect()
    assert len(rows) == 1
    [r] = rows
    assert r["title"]["lex"] == "SPARQL Tutorial" and r["price"]["lex"] == "42"


def test_stored_query_unregistered_raises(engine):
    with pytest.raises(Exception, match="no stored query registered"):
        engine.select(
            "SELECT * { SERVICE "
            "<http://www.bigdata.com/rdf/stored-query#missing> { } }"
        ).df.collect()
