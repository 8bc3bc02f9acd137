"""Result serializers + distributed N-Triples writer round-trip."""

import json

import pytest

from database_spark.rio.reader import read_ntriples
from database_spark.rio.writers import (
    ntriples_lines,
    results_csv,
    results_json,
    results_tsv,
    results_xml,
    write_ntriples,
)
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture(scope="module")
def engine(spark):
    trips = [
        (Term.iri(EX + "a"), Term.iri(EX + "name"), Term.literal("Ann, \"A\"")),
        (Term.iri(EX + "a"), Term.iri(EX + "age"), Term.integer(30)),
        (Term.iri(EX + "a"), Term.iri(EX + "note"), Term.literal("salut", lang="fr")),
        (Term.bnode("x"), Term.iri(EX + "name"), Term.literal("Bee")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    return SparqlEngine(store)


@pytest.fixture(scope="module")
def result(engine):
    return engine.select(
        f'PREFIX ex: <{EX}> SELECT ?s ?o WHERE {{ ?s ex:name ?o }}'
    )


def test_results_json(result):
    doc = json.loads(results_json(result))
    assert doc["head"]["vars"] == ["s", "o"]
    bindings = doc["results"]["bindings"]
    assert len(bindings) == 2
    types = sorted(b["s"]["type"] for b in bindings)
    assert types == ["bnode", "uri"]
    vals = sorted(b["o"]["value"] for b in bindings)
    assert vals == ['Ann, "A"', "Bee"]


def test_results_xml(result):
    xml = results_xml(result)
    assert xml.startswith('<?xml version="1.0"?>')
    assert '<variable name="s"/>' in xml and "<uri>" in xml and "<bnode>" in xml
    assert 'Ann, "A"' in xml  # quotes are legal in element text


def test_results_csv_tsv(engine):
    res = engine.select(
        f'PREFIX ex: <{EX}> SELECT ?o WHERE {{ <{EX}a> ex:note ?o }}'
    )
    csv = results_csv(res)
    assert csv == "o\nsalut\n"
    tsv = results_tsv(res)
    assert tsv == '?o\n"salut"@fr\n'
    res2 = engine.select(
        f'PREFIX ex: <{EX}> SELECT ?o WHERE {{ <{EX}a> ex:name ?o }}'
    )
    assert results_csv(res2).splitlines()[1] == '"Ann, ""A"""'


def test_ntriples_roundtrip(spark, engine, tmp_path):
    path = str(tmp_path / "dump.nt")
    write_ntriples(engine.store.df, path)
    back = read_ntriples(spark, path, distributed=True)
    assert back.count() == engine.store.df.count()
    lines = {r["value"] for r in ntriples_lines(engine.store.df).collect()}
    assert any('"30"^^<http://www.w3.org/2001/XMLSchema#integer>' in ln for ln in lines)
    assert any('"salut"@fr' in ln for ln in lines)
    assert any(ln.startswith("_:") for ln in lines)


def test_describe_cbd(spark):
    """CBD follows bnode chains forward; symmetric does one step both ways."""
    from database_spark.sparql.engine import SparqlEngine as Eng
    from database_spark.store import TripleStore as TS

    b1, b2 = Term.bnode("b1"), Term.bnode("b2")
    p = Term.iri(EX + "p")
    trips = [
        (Term.iri(EX + "r"), p, b1),
        (b1, p, b2),
        (b2, p, Term.literal("deep")),
        (Term.iri(EX + "other"), p, Term.iri(EX + "r")),  # backward stmt
        (Term.iri(EX + "unrelated"), p, Term.literal("x")),
    ]
    eng = Eng(TS.from_python_triples(spark, trips))
    cbd = eng.describe(f"DESCRIBE <{EX}r>", mode="cbd")
    got = sorted((r["st"]["lex"], r["ot"]["lex"]) for r in cbd.collect())
    # forward chain through both bnodes, NOT the backward statement
    assert got == [("b1", "b2"), ("b2", "deep"), (EX + "r", "b1")]
    sym = eng.describe(f"DESCRIBE <{EX}r>")
    got_sym = sorted((r["st"]["lex"], r["ot"]["lex"]) for r in sym.collect())
    assert (EX + "other", EX + "r") in got_sym  # backward included
    assert ("b1", "b2") not in got_sym  # but no recursion
