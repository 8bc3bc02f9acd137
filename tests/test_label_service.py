"""Wikibase label SERVICE (ticket_bg1817 surface): auto-bound ?xLabel
with language preference and local-name fallback."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import RDFS, Term

WD = "http://www.wikidata.org/entity/"
EX = "http://example.org/"


@pytest.fixture(scope="module")
def engine(spark):
    label = Term.iri(RDFS + "label")
    knows = Term.iri(EX + "knows")
    trips = [
        (Term.iri(WD + "Q1"), label, Term.literal("universe", lang="en")),
        (Term.iri(WD + "Q1"), label, Term.literal("univers", lang="fr")),
        (Term.iri(WD + "Q2"), label, Term.literal("terre", lang="fr")),
        (Term.iri(WD + "Q1"), knows, Term.iri(WD + "Q2")),
        (Term.iri(WD + "Q2"), knows, Term.iri(WD + "Q3")),  # Q3 unlabeled
    ]
    return SparqlEngine(TripleStore.from_python_triples(spark, trips))


def _pairs(res, a, b):
    return sorted(
        (
            r[a]["lex"] if r[a] else None,
            r[b]["lex"] if r[b] else None,
        )
        for r in res.df.collect()
    )


def test_label_service_en_with_fallbacks(engine):
    res = engine.select(f"""
        PREFIX wikibase: <http://wikiba.se/ontology#>
        PREFIX ex: <{EX}>
        SELECT ?o ?oLabel WHERE {{
          ?s ex:knows ?o .
          SERVICE wikibase:label {{ bd:serviceParam wikibase:language "en,fr" . }}
        }}""")
    got = _pairs(res, "o", "oLabel")
    # Q2 has no en label -> fr; Q3 has none -> local-name fallback
    assert got == [(WD + "Q2", "terre"), (WD + "Q3", "Q3")]


def test_label_service_language_priority(engine):
    res = engine.select(f"""
        PREFIX wikibase: <http://wikiba.se/ontology#>
        PREFIX ex: <{EX}>
        SELECT ?s ?sLabel WHERE {{
          ?s ex:knows ?o .
          SERVICE wikibase:label {{ bd:serviceParam wikibase:language "fr,en" . }}
        }}""")
    got = _pairs(res, "s", "sLabel")
    assert got == [(WD + "Q1", "univers"), (WD + "Q2", "terre")]
