"""N-Quads + TriG WRITERS (the read side existed; this closes the quad
half of the RIO format matrix): round-trips through our own readers,
distributed dump parts, and GETSTMTS content negotiation."""

import urllib.parse
import urllib.request

import pytest

from database_spark.rio.reader import TurtleParser, parse_nt_line
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def _quads(spark, quads):
    from database_spark.rio.reader import quads_to_df
    from database_spark.store import _with_ids

    return _with_ids(quads_to_df(spark, quads))


QUADS = [
    (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("default"), None),
    (Term.iri(EX + "a"), Term.iri(EX + "q"), Term.integer(7), Term.iri(EX + "g1")),
    (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal("x", lang="en"), Term.iri(EX + "g1")),
    (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal('quo"te'), Term.iri(EX + "g2")),
]


def _key(t):
    return None if t is None else (t.kind, t.lex, t.dt, t.lang)


def _want():
    return {tuple(_key(x) for x in q) for q in QUADS}


def test_nquads_roundtrip(spark):
    from database_spark.rio.writers import nquads_string

    doc = nquads_string(_quads(spark, QUADS))
    got = set()
    for line in doc.splitlines():
        q = parse_nt_line(line)
        if q:
            got.add(tuple(_key(x) for x in q))
    assert got == _want()
    # default-graph line has exactly 3 terms + dot
    dq = [l for l in doc.splitlines() if "default" in l]
    assert len(dq) == 1 and dq[0].count("<http") == 2


def test_trig_roundtrip(spark):
    from database_spark.rio.writers import trig_string

    doc = trig_string(_quads(spark, QUADS))
    assert "@prefix" in doc and "{" in doc
    got = {
        tuple(_key(x) for x in q)
        for q in TurtleParser(doc).parse()
    }
    assert got == _want()


def test_write_trig_distributed_parts(spark, tmp_path):
    from database_spark.rio.writers import write_trig

    out = tmp_path / "trig_dump"
    write_trig(_quads(spark, QUADS), str(out))
    parts = [p for p in sorted(out.glob("part-*")) if p.stat().st_size > 0]
    assert parts
    got = set()
    for part in parts:
        text = part.read_text(encoding="utf-8")
        assert text.startswith("@prefix")
        got |= {
            tuple(_key(x) for x in q) for q in TurtleParser(text).parse()
        }
    assert got == _want()


def test_getstmts_quad_negotiation(spark):
    from database_spark.rio.reader import quads_to_df
    from database_spark.store import _with_ids

    store = TripleStore(spark, _with_ids(quads_to_df(spark, QUADS)), has_named=True)
    ep = None
    try:
        from database_spark.server import SparqlEndpoint

        ep = SparqlEndpoint(SparqlEngine(store)).start()
        url = ep.url + "?" + urllib.parse.urlencode({"GETSTMTS": ""})
        req = urllib.request.Request(
            url, headers={"Accept": "application/n-quads"}
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers.get_content_type() == "application/n-quads"
            body = r.read().decode()
        assert f"<{EX}g1>" in body and f"<{EX}g2>" in body
        assert len([l for l in body.splitlines() if l.strip()]) == 4
        req = urllib.request.Request(url, headers={"Accept": "application/trig"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get_content_type() == "application/trig"
            doc = r.read().decode()
        got = {
            tuple(_key(x) for x in q) for q in TurtleParser(doc).parse()
        }
        assert got == _want()
    finally:
        if ep is not None:
            ep.stop()
