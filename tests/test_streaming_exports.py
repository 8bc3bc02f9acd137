"""Round-6 verdict #2: the export/serialization path must stream —
no full-graph ``.collect()`` in any writer, distributed RDF/XML and
JSON-LD dumps, and chunked HTTP transfer for large bodies.

The store here is deliberately larger than any single chunk, so the
tests prove the document arrives as MANY chunks (bounded driver/server
memory), not one materialized string.
"""

import urllib.parse
import urllib.request

import pytest

from database_spark.rio.jsonld import parse_jsonld
from database_spark.rio.rdfxml import parse_rdfxml
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"
N = 400


@pytest.fixture(scope="module")
def big_store(spark):
    trips = []
    for i in range(N):
        trips.append(
            (Term.iri(EX + f"s{i}"), Term.iri(EX + "name"), Term.literal(f"n{i}"))
        )
        trips.append(
            (Term.iri(EX + f"s{i}"), Term.iri(EX + "knows"), Term.iri(EX + f"s{(i + 1) % N}"))
        )
    return TripleStore.from_python_triples(spark, trips)


def _triple_set(df):
    def key(t):
        return (t["kind"], t["lex"], t["dt"], t["lang"]) if t else None

    return {
        (key(r["st"]), key(r["pt"]), key(r["ot"]))
        for r in df.select("st", "pt", "ot").collect()
    }


def test_iter_rdfxml_streams_many_chunks(big_store):
    from database_spark.rio.writers import iter_rdfxml

    chunks = list(iter_rdfxml(big_store.df))
    # one chunk per subject block + header + footer: genuinely streamed
    assert len(chunks) == N + 2
    doc = "".join(chunks)
    got = {
        ((s.kind, s.lex, s.dt, s.lang), (p.kind, p.lex, p.dt, p.lang),
         (o.kind, o.lex, o.dt, o.lang))
        for s, p, o in parse_rdfxml(doc)
    }
    assert got == _triple_set(big_store.df)


def test_write_rdfxml_distributed_parts_standalone(spark, big_store, tmp_path):
    from database_spark.rio.writers import write_rdfxml

    out = tmp_path / "xml_dump"
    write_rdfxml(big_store.df, str(out), partitions=3)
    parts = [p for p in sorted(out.glob("part-*")) if p.stat().st_size > 0]
    assert len(parts) >= 2
    got = set()
    for part in parts:
        text = part.read_text(encoding="utf-8")
        assert text.startswith("<?xml")  # standalone document per part
        got |= {
            ((s.kind, s.lex, s.dt, s.lang), (p.kind, p.lex, p.dt, p.lang),
             (o.kind, o.lex, o.dt, o.lang))
            for s, p, o in parse_rdfxml(text)
        }
    assert got == _triple_set(big_store.df)


def test_iter_jsonld_streams_and_roundtrips(big_store):
    from database_spark.rio.writers import iter_jsonld

    chunks = list(iter_jsonld(big_store.df))
    assert len(chunks) == N + 2
    doc = "".join(chunks)
    got = {
        ((s.kind, s.lex, s.dt, s.lang), (p.kind, p.lex, p.dt, p.lang),
         (o.kind, o.lex, o.dt, o.lang))
        for s, p, o, _g in parse_jsonld(doc)
    }
    assert got == _triple_set(big_store.df)


def test_write_jsonld_distributed_parts_standalone(spark, big_store, tmp_path):
    from database_spark.rio.writers import write_jsonld

    out = tmp_path / "jsonld_dump"
    write_jsonld(big_store.df, str(out), partitions=3)
    parts = [p for p in sorted(out.glob("part-*")) if p.stat().st_size > 0]
    assert len(parts) >= 2
    got = set()
    for part in parts:
        text = part.read_text(encoding="utf-8")
        import json

        json.loads(text)  # each part is a standalone JSON document
        got |= {
            ((s.kind, s.lex, s.dt, s.lang), (p.kind, p.lex, p.dt, p.lang),
             (o.kind, o.lex, o.dt, o.lang))
            for s, p, o, _g in parse_jsonld(text)
        }
    assert got == _triple_set(big_store.df)


def test_streamed_response_is_snapshot_isolated(spark):
    """A chunked response begun before an UPDATE serves the store AS OF
    query start — store DataFrames are immutable, so mid-stream commits
    can't tear the result (MVCC through the streaming path)."""
    import http.client

    from database_spark.server import SparqlEndpoint

    trips = [
        (Term.iri(EX + f"r{i}"), Term.iri(EX + "v"), Term.literal(str(i)))
        for i in range(200)
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    ep = SparqlEndpoint(eng).start()
    try:
        host, port = ep.url.split("/")[2].split(":")
        q = f"PREFIX ex: <{EX}> SELECT ?s ?o WHERE {{ ?s ex:v ?o }}"
        conn = http.client.HTTPConnection(host, int(port))
        conn.request(
            "GET",
            "/sparql?" + urllib.parse.urlencode({"query": q, "format": "csv"}),
        )
        resp = conn.getresponse()
        assert resp.status == 200
        # read only the first chunk's worth, then mutate the store
        first = resp.read(64)
        eng.update(
            f'PREFIX ex: <{EX}> INSERT DATA {{ ex:late ex:v "LATE" }}'
        )
        rest = resp.read()
        conn.close()
        body = (first + rest).decode()
        lines = [l for l in body.strip().splitlines() if l]
        assert len(lines) == 201  # header + the 200 pre-update rows
        assert "LATE" not in body
        # a fresh request sees the new row
        with urllib.request.urlopen(
            ep.url + "?" + urllib.parse.urlencode({"query": q, "format": "csv"})
        ) as r:
            assert "LATE" in r.read().decode()
    finally:
        ep.stop()


def test_http_chunked_transfer_for_large_bodies(spark, big_store):
    """SELECT and CONSTRUCT responses stream with Transfer-Encoding:
    chunked — the server never buffers the whole body — and the
    documents are intact end to end."""
    from database_spark.server import SparqlEndpoint

    ep = SparqlEndpoint(SparqlEngine(big_store)).start()
    try:
        q = f"PREFIX ex: <{EX}> SELECT ?s ?n WHERE {{ ?s ex:name ?n }}"
        url = ep.url + "?" + urllib.parse.urlencode({"query": q})
        req = urllib.request.Request(
            url, headers={"Accept": "application/sparql-results+json"}
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            assert r.headers.get("Content-Length") is None
            import json

            body = json.loads(r.read().decode())
        assert len(body["results"]["bindings"]) == N

        cq = f"PREFIX ex: <{EX}> CONSTRUCT {{ ?s ex:name ?n }} WHERE {{ ?s ex:name ?n }}"
        curl = ep.url + "?" + urllib.parse.urlencode({"query": cq})
        req = urllib.request.Request(
            curl, headers={"Accept": "application/rdf+xml"}
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            doc = r.read().decode()
        assert len(parse_rdfxml(doc)) == N

        # errors still get a proper status line (priming runs the
        # query before the 200 commits)
        bad = ep.url + "?" + urllib.parse.urlencode({"query": "SELECT ?x WHERE"})
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP error")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        ep.stop()
