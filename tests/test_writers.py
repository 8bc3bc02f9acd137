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


# ------------------------------------------------------------- turtle
def _triple_set(df):
    def key(t):
        return (t["kind"], t["lex"], t["dt"], t["lang"]) if t else None

    return {
        (key(r["st"]), key(r["pt"]), key(r["ot"]))
        for r in df.select("st", "pt", "ot").collect()
    }


@pytest.fixture(scope="module")
def ttl_store(spark):
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    trips = [
        (Term.iri(EX + "a"), Term.iri(RDF + "type"), Term.iri(EX + "Person")),
        (Term.iri(EX + "a"), Term.iri(EX + "name"), Term.literal('Ann "A"\nx')),
        (Term.iri(EX + "a"), Term.iri(EX + "age"), Term.integer(30)),
        (Term.iri(EX + "a"), Term.iri(EX + "score"), Term.double(1.5)),
        (Term.iri(EX + "a"), Term.iri(EX + "note"), Term.literal("salut", lang="fr")),
        (Term.iri(EX + "a"), Term.iri(EX + "knows"), Term.iri(EX + "b")),
        (Term.iri(EX + "b"), Term.iri(EX + "name"), Term.literal("Bee")),
        (Term.bnode("x"), Term.iri(EX + "name"), Term.literal("Anon")),
        # IRI whose local name is not PN_LOCAL-safe -> <...> fallback
        (Term.iri(EX + "weird/loc.al"), Term.iri(EX + "name"), Term.literal("W")),
    ]
    return TripleStore.from_python_triples(spark, trips)


def test_turtle_roundtrip(spark, ttl_store, tmp_path):
    from database_spark.rio.reader import read_turtle
    from database_spark.rio.writers import turtle_string

    doc = turtle_string(ttl_store.df)
    assert "@prefix" in doc
    p = tmp_path / "dump.ttl"
    p.write_text(doc, encoding="utf-8")
    back = read_turtle(spark, str(p))
    want = _triple_set(ttl_store.df)
    got = _triple_set(back)
    # bnode labels are renamed on parse; compare modulo bnode identity
    def blur(s):
        return {
            tuple(
                (0, "_", None, None) if k and k[0] == 2 else k for k in trip
            )
            for trip in s
        }

    assert blur(got) == blur(want)


def test_turtle_abbreviations(ttl_store):
    from database_spark.rio.writers import turtle_string

    doc = turtle_string(ttl_store.df, prefixes={"ex": EX})
    assert "ex:a a ex:Person" in doc        # rdf:type as `a`, first
    assert "ex:age 30" in doc               # bare integer
    # "1.5" without exponent would re-parse as xsd:decimal, so the
    # writer must keep the typed form for doubles
    assert '"1.5"^^xsd:double' in doc
    assert '"salut"@fr' in doc              # lang literal
    assert f"<{EX}weird/loc.al>" in doc     # non-PN_LOCAL falls back


def test_write_turtle_partition_headers(spark, ttl_store, tmp_path):
    from database_spark.rio.reader import read_turtle
    from database_spark.rio.writers import write_turtle

    out = tmp_path / "ttl_dump"
    write_turtle(ttl_store.df.repartition(3), str(out), prefixes={"ex": EX})
    parts = sorted(out.glob("part-*"))
    assert parts
    total = set()
    for part in parts:
        text = part.read_text(encoding="utf-8")
        if not text.strip():
            continue
        assert text.startswith("@prefix")  # standalone document
        total |= _triple_set(read_turtle(spark, str(part)))
    want = _triple_set(ttl_store.df)
    assert len(total) == len(want)


def test_server_turtle_negotiation(spark, ttl_store):
    import urllib.request

    from database_spark.server import SparqlEndpoint

    eng = SparqlEngine(ttl_store)
    ep = SparqlEndpoint(eng).start()
    try:
        q = f"PREFIX ex: <{EX}> CONSTRUCT {{ ?s ex:name ?o }} WHERE {{ ?s ex:name ?o }}"
        import urllib.parse

        url = ep.url + "?" + urllib.parse.urlencode({"query": q})
        req = urllib.request.Request(url, headers={"Accept": "text/turtle"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Content-Type", "").startswith("text/turtle")
            body = r.read().decode()
        assert "@prefix" in body and "Bee" in body
        req = urllib.request.Request(url, headers={"Accept": "application/n-triples"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Content-Type", "").startswith(
                "application/n-triples"
            )
    finally:
        ep.stop()


def test_describe_cache_hits_and_invalidates(spark):
    """DESCRIBE plan cache (DescribeCacheServlet analog): identical
    DESCRIBEs reuse the compiled plan; any UPDATE invalidates."""
    eng = SparqlEngine(
        TripleStore.from_python_triples(
            spark,
            [(Term.iri(EX + "a"), Term.iri(EX + "name"), Term.literal("Ann"))],
        )
    )
    q = f"DESCRIBE <{EX}a>"
    d1 = eng.describe(q)
    assert eng.describe(q) is d1  # same plan object = cache hit
    assert d1.count() == 1
    eng.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:a ex:age "7" }}')
    d2 = eng.describe(q)
    assert d2 is not d1
    assert d2.count() == 2


def test_rdfxml_roundtrip(spark, ttl_store, tmp_path):
    from database_spark.rio.rdfxml import parse_rdfxml
    from database_spark.rio.writers import rdfxml_string

    doc = rdfxml_string(ttl_store.df)
    assert doc.startswith('<?xml version="1.0"')
    got = parse_rdfxml(doc)
    want = _triple_set(ttl_store.df)

    def blur(trips):
        out = set()
        for s, p, o in trips:
            out.add(
                tuple(
                    (0, "_", None, None)
                    if getattr(t, "kind", t[0] if isinstance(t, tuple) else None) == 2
                    else (
                        (t.kind, t.lex, t.dt, t.lang)
                        if hasattr(t, "kind")
                        else t
                    )
                    for t in (s, p, o)
                )
            )
        return out

    assert blur(got) == blur([tuple(t) for t in want])


def test_jsonld_roundtrip(spark, ttl_store, tmp_path):
    from database_spark.rio.reader import TRIPLE_SCHEMA  # noqa: F401
    from database_spark.rio.jsonld import parse_jsonld
    from database_spark.rio.writers import jsonld_string

    doc = jsonld_string(ttl_store.df)
    quads = parse_jsonld(doc)
    got = {
        (
            (s.kind, s.lex if s.kind != 2 else "_", s.dt, s.lang),
            (p.kind, p.lex, p.dt, p.lang),
            (o.kind, o.lex if o.kind != 2 else "_", o.dt, o.lang),
        )
        for s, p, o, _g in quads
    }
    want = {
        tuple(
            (k[0], k[1] if k[0] != 2 else "_", k[2], k[3]) for k in trip
        )
        for trip in _triple_set(ttl_store.df)
    }
    assert got == want
