"""Remote SPARQL SERVICE (federation) with a hermetic fake endpoint."""

import pytest

from database_spark.sparql.federation import (
    make_remote_service,
    remote_query_with_bindings,
)
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def fake_endpoint(captured):
    """Return a fetcher that records queries and answers a fixed set."""

    def fetch(endpoint, query):
        captured.append((endpoint, query))
        if "boom" in endpoint:
            raise OSError("connection refused")
        return {
            "head": {"vars": ["x", "label"]},
            "results": {
                "bindings": [
                    {
                        "x": {"type": "uri", "value": EX + "a"},
                        "label": {"type": "literal", "value": "remote-A"},
                    },
                    {
                        "x": {"type": "uri", "value": EX + "b"},
                        "label": {
                            "type": "literal",
                            "value": "remote-B",
                            "xml:lang": "en",
                        },
                    },
                    {"x": {"type": "uri", "value": EX + "zzz"}},  # label unbound
                ]
            },
        }

    return fetch


@pytest.fixture()
def engine(spark):
    trips = [
        (Term.iri(EX + "a"), Term.iri(EX + "local"), Term.literal("local-A")),
        (Term.iri(EX + "b"), Term.iri(EX + "local"), Term.literal("local-B")),
        (Term.iri(EX + "c"), Term.iri(EX + "local"), Term.literal("local-C")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    captured = []
    eng = SparqlEngine(
        store, services=make_remote_service(fetcher=fake_endpoint(captured))
    )
    eng._captured = captured
    return eng


def test_remote_service_joins_local(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x ?label ?loc WHERE {{
          SERVICE <http://remote.example/sparql> {{ ?x ex:name ?label }}
          ?x ex:local ?loc .
        }}""")
    rows = sorted(
        (r["x"]["lex"], r["label"]["lex"] if r["label"] else None, r["loc"]["lex"])
        for r in res.df.collect()
    )
    # zzz has no local triple -> dropped by the join; a and b survive
    assert rows == [
        (EX + "a", "remote-A", "local-A"),
        (EX + "b", "remote-B", "local-B"),
    ]
    endpoint, query = engine._captured[0]
    assert endpoint == "http://remote.example/sparql"
    assert "?x" in query and "SELECT *" in query


def test_remote_service_silent_on_error(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?s ?o WHERE {{
          SERVICE SILENT <http://boom.example/sparql> {{ ?s ex:name ?o }}
          ?s ex:local ?o2 .
          BIND(?o2 AS ?o)
        }}""")
    assert res.df.count() == 3  # SILENT → unit solution, local part survives


def test_remote_service_error_raises(engine):
    with pytest.raises(Exception):
        engine.select(f"""
            PREFIX ex: <{EX}>
            SELECT ?s WHERE {{
              SERVICE <http://boom.example/sparql> {{ ?s ex:name ?o }}
            }}""")


def test_vectored_query_builder():
    rows = [
        {"x": {"kind": 0, "lex": EX + "a", "dt": None, "lang": None}},
        {"x": None},
    ]
    q = remote_query_with_bindings("?x <urn:p> ?y .", ["x"], rows)
    assert "VALUES (?x)" in q
    assert f"(<{EX}a>)" in q and "(UNDEF)" in q
