"""External full-text SERVICE (fts:) — hermetic transport tests.

Reference: FTS.java vocabulary, FulltextSearchException.java error
contract, TestFulltextSearch.java expectations.
"""

import pytest

from database_spark.search import external_fts as XF
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.com/"
FTS = "http://www.bigdata.com/rdf/fts#"

DOCS = [
    {"id": "SYSTAP", "uri": EX + "SYSTAP", "description": "graph databases"},
    {"id": "Apple", "uri": EX + "Apple", "description": "innovative IT hardware"},
]


@pytest.fixture()
def fts_engine(spark):
    def transport(endpoint, query, params, timeout_ms, search_field):
        assert endpoint.startswith("http"), endpoint
        kws = [k.strip().lower() for k in query.split("|")]
        return [
            dict(d, score=0.5)
            for d in DOCS
            if any(k in (d["id"] + " " + d["description"]).lower() for k in kws)
        ]

    XF.set_transport(transport)
    trips = [
        (Term.iri(EX + "SYSTAP"), Term.iri(EX + "label"), Term.literal("Systap Inc")),
        (Term.iri(EX + "Apple"), Term.iri(EX + "label"), Term.literal("Apple Inc")),
        (Term.iri(EX + "Terms"), Term.iri(EX + "term"), Term.literal("Apple")),
        (Term.iri(EX + "Terms"), Term.iri(EX + "term"), Term.literal("databases")),
    ]
    yield SparqlEngine(TripleStore.from_python_triples(spark, trips))
    XF.set_transport(None)


def _lex(res, var):
    return sorted(r[var]["lex"] for r in res.df.collect() if r[var] is not None)


def test_fts_service_block_and_join(fts_engine):
    res = fts_engine.select(f"""
        PREFIX fts: <{FTS}>
        PREFIX ex: <{EX}>
        SELECT ?res ?label WHERE {{
          SERVICE <{FTS}search> {{
            ?res fts:search "IT" .
            ?res fts:endpoint "http://mock/solr" .
            ?res fts:searchField "uri" .
            ?res fts:searchResultType "URI" .
          }}
          ?res ex:label ?label .
        }}""")
    assert _lex(res, "label") == ["Apple Inc"]


def test_fts_magic_predicates_lifted(fts_engine):
    # bare fts: triples outside SERVICE — ASTSearchOptimizer lifting
    res = fts_engine.select(f"""
        PREFIX fts: <{FTS}>
        SELECT ?res ?score WHERE {{
          ?res fts:search "graph" .
          ?res fts:endpoint "http://mock/solr" .
          ?res fts:scoreField "score" .
          ?res fts:score ?score .
        }}""")
    rows = res.df.collect()
    assert _lex(res, "res") == ["SYSTAP"]
    [row] = rows
    assert row["score"]["dt"].endswith("double")


def test_fts_reject_errors(fts_engine):
    base = f"PREFIX fts: <{FTS}> SELECT ?res WHERE {{ ?res fts:endpoint \"http://mock\" }}"
    with pytest.raises(Exception, match="Search string not specified"):
        fts_engine.select(base).df.collect()
    with pytest.raises(Exception, match="Endpoint not specified"):
        fts_engine.select(
            f'PREFIX fts: <{FTS}> SELECT ?res WHERE {{ ?res fts:search "x" . '
            f'?res fts:endpoint "" }}'
        ).df.collect()
    with pytest.raises(Exception, match="Casting of result to URI failed"):
        fts_engine.select(
            f'PREFIX fts: <{FTS}> SELECT ?res WHERE {{ ?res fts:search "IT" . '
            f'?res fts:endpoint "http://mock" . '
            f'?res fts:searchResultType "URI" }}'
        ).df.collect()


def test_fts_variable_injection_needs_runlast(fts_engine, spark):
    q = f"""
        PREFIX fts: <{FTS}>
        PREFIX ex: <{EX}>
        SELECT ?res ?t WHERE {{
          ex:Terms ex:term ?t .
          SERVICE <{FTS}search> {{
            ?res fts:search ?t .
            ?res fts:endpoint "http://mock/solr" .
          }}
          %HINT%
        }}"""
    with pytest.raises(Exception, match="magic variable unbound"):
        fts_engine.select(q.replace("%HINT%", "")).df.collect()
    res = fts_engine.select(
        q.replace(
            "%HINT%",
            '<http://www.bigdata.com/queryHints#Prior> '
            '<http://www.bigdata.com/queryHints#runLast> "true" .',
        )
    )
    # "Apple" matches the Apple doc, "databases" the SYSTAP doc
    assert _lex(res, "res") == ["Apple", "SYSTAP"]
