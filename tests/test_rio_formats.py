"""Format readers: TriG, RDF/XML, JSON-LD, Turtle collections, RDF*.

Mirrors the reference's RIO format coverage (Sesame formats wired via
bigdata-rdf/.../rio/; TriG + RDF/XML + JSON-LD parsers)."""

import textwrap

import pytest

from database_spark import terms as T
from database_spark.rio.jsonld import parse_jsonld
from database_spark.rio.rdfxml import parse_rdfxml
from database_spark.rio.reader import TurtleParser, read_rdf, statement_sid

EX = "http://example.org/"


def quads_set(quads):
    return {(s.n3(), p.n3(), o.n3(), g.n3() if g else None) for s, p, o, g in quads}


def triples_set(triples):
    return {(s.n3(), p.n3(), o.n3()) for s, p, o in triples}


def parse_ttl(text):
    p = TurtleParser(text)
    p.parse()
    return p.triples


# ------------------------------------------------------------------ TriG
def test_trig_graph_blocks():
    text = textwrap.dedent(f"""\
        @prefix ex: <{EX}> .
        ex:a ex:p ex:b .
        GRAPH ex:g1 {{ ex:a ex:q "in-g1" . ex:b ex:q "also" . }}
        ex:g2 {{ ex:c ex:r 42 . }}
        {{ ex:d ex:s true . }}
        """)
    quads = TurtleParser(text).parse()
    got = quads_set(quads)
    assert (f"<{EX}a>", f"<{EX}p>", f"<{EX}b>", None) in got
    assert (f"<{EX}a>", f"<{EX}q>", '"in-g1"', f"<{EX}g1>") in got
    assert (f"<{EX}b>", f"<{EX}q>", '"also"', f"<{EX}g1>") in got
    assert any(g == f"<{EX}g2>" and o.startswith('"42"') for _, _, o, g in got)
    assert any(g is None and "true" in o for s, _, o, g in got if s == f"<{EX}d>")


def test_turtle_collection_and_bnode_list():
    text = textwrap.dedent(f"""\
        @prefix ex: <{EX}> .
        ex:a ex:list (1 2 3) .
        [ ex:p "anon" ] .
        ex:b ex:q [ ex:inner 5 ] .
        """)
    trips = triples_set(parse_ttl(text))
    firsts = [t for t in trips if t[1] == f"<{T.RDF}first>"]
    rests = [t for t in trips if t[1] == f"<{T.RDF}rest>"]
    assert len(firsts) == 3 and len(rests) == 3
    assert sum(1 for t in rests if t[2] == f"<{T.RDF}nil>") == 1
    assert any(t[1] == f"<{EX}p>" and t[2] == '"anon"' for t in trips)
    assert any(t[1] == f"<{EX}inner>" for t in trips)


def test_turtle_empty_collection():
    trips = parse_ttl(f"<{EX}a> <{EX}p> () .")
    assert trips[0][2].n3() == f"<{T.RDF}nil>"


def test_rdfstar_embedded_triple():
    text = f'<< <{EX}a> <{EX}p> <{EX}b> >> <{EX}certainty> "0.9" .'
    trips = parse_ttl(text)
    tset = triples_set(trips)
    # the embedded triple is asserted
    assert (f"<{EX}a>", f"<{EX}p>", f"<{EX}b>") in tset
    # and its SID carries the annotation
    from database_spark.terms import Term

    sid = statement_sid(Term.iri(EX + "a"), Term.iri(EX + "p"), Term.iri(EX + "b"))
    assert (sid.n3(), f"<{EX}certainty>", '"0.9"') in tset


# ---------------------------------------------------------------- RDF/XML
def test_rdfxml_basic_and_typed_nodes():
    xml = textwrap.dedent(f"""\
        <rdf:RDF xmlns:rdf="{T.RDF}" xmlns:ex="{EX}">
          <rdf:Description rdf:about="{EX}alice">
            <ex:name>Alice</ex:name>
            <ex:age rdf:datatype="{T.XSD}integer">30</ex:age>
            <ex:knows rdf:resource="{EX}bob"/>
          </rdf:Description>
          <ex:Person rdf:about="{EX}bob">
            <ex:name xml:lang="en">Bob</ex:name>
          </ex:Person>
        </rdf:RDF>
        """)
    trips = triples_set(parse_rdfxml(xml))
    assert (f"<{EX}alice>", f"<{EX}name>", '"Alice"') in trips
    assert (f"<{EX}alice>", f"<{EX}age>", f'"30"^^<{T.XSD}integer>') in trips
    assert (f"<{EX}alice>", f"<{EX}knows>", f"<{EX}bob>") in trips
    assert (f"<{EX}bob>", f"<{T.RDF}type>", f"<{EX}Person>") in trips
    assert (f"<{EX}bob>", f"<{EX}name>", '"Bob"@en') in trips


def test_rdfxml_nested_parsetype_collection_li():
    xml = textwrap.dedent(f"""\
        <rdf:RDF xmlns:rdf="{T.RDF}" xmlns:ex="{EX}">
          <rdf:Description rdf:about="{EX}a">
            <ex:addr rdf:parseType="Resource">
              <ex:city>Springfield</ex:city>
            </ex:addr>
            <ex:items rdf:parseType="Collection">
              <rdf:Description rdf:about="{EX}x"/>
              <rdf:Description rdf:about="{EX}y"/>
            </ex:items>
            <ex:child><ex:Person rdf:about="{EX}kid"/></ex:child>
          </rdf:Description>
          <rdf:Seq rdf:about="{EX}seq">
            <rdf:li>one</rdf:li>
            <rdf:li>two</rdf:li>
          </rdf:Seq>
        </rdf:RDF>
        """)
    trips = triples_set(parse_rdfxml(xml))
    assert any(t[1] == f"<{EX}city>" and t[2] == '"Springfield"' for t in trips)
    firsts = [t for t in trips if t[1] == f"<{T.RDF}first>"]
    assert {t[2] for t in firsts} == {f"<{EX}x>", f"<{EX}y>"}
    assert (f"<{EX}a>", f"<{EX}child>", f"<{EX}kid>") in trips
    assert (f"<{EX}seq>", f"<{T.RDF}_1>", '"one"') in trips
    assert (f"<{EX}seq>", f"<{T.RDF}_2>", '"two"') in trips


def test_rdfxml_rdf_id_and_reification():
    xml = textwrap.dedent(f"""\
        <rdf:RDF xmlns:rdf="{T.RDF}" xmlns:ex="{EX}" xml:base="{EX}doc">
          <rdf:Description rdf:ID="frag">
            <ex:p rdf:ID="st1">v</ex:p>
          </rdf:Description>
        </rdf:RDF>
        """)
    trips = triples_set(parse_rdfxml(xml))
    assert (f"<{EX}doc#frag>", f"<{EX}p>", '"v"') in trips
    assert (f"<{EX}doc#st1>", f"<{T.RDF}type>", f"<{T.RDF}Statement>") in trips
    assert (f"<{EX}doc#st1>", f"<{T.RDF}object>", '"v"') in trips


# ---------------------------------------------------------------- JSON-LD
def test_jsonld_context_nodes_values():
    doc = """{
      "@context": {
        "ex": "http://example.org/",
        "name": "http://example.org/name",
        "knows": {"@id": "http://example.org/knows", "@type": "@id"},
        "age": {"@id": "http://example.org/age"}
      },
      "@id": "ex:alice",
      "@type": "ex:Person",
      "name": "Alice",
      "age": 30,
      "knows": ["ex:bob", {"@id": "ex:carol"}]
    }"""
    quads = parse_jsonld(doc)
    trips = {(s.n3(), p.n3(), o.n3()) for s, p, o, _ in quads}
    assert (f"<{EX}alice>", f"<{T.RDF}type>", f"<{EX}Person>") in trips
    assert (f"<{EX}alice>", f"<{EX}name>", '"Alice"') in trips
    assert (f"<{EX}alice>", f"<{EX}age>", f'"30"^^<{T.XSD}integer>') in trips
    assert (f"<{EX}alice>", f"<{EX}knows>", f"<{EX}bob>") in trips
    assert (f"<{EX}alice>", f"<{EX}knows>", f"<{EX}carol>") in trips


def test_jsonld_value_objects_graph_list():
    doc = """{
      "@context": {"ex": "http://example.org/"},
      "@graph": [
        {"@id": "ex:a", "ex:label": {"@value": "hallo", "@language": "de"},
         "ex:score": {"@value": "1.5", "@type": "ex:dt"},
         "ex:seq": {"@list": [1, 2]}},
        {"@id": "ex:g", "@graph": [{"@id": "ex:b", "ex:p": true}]}
      ]
    }"""
    quads = parse_jsonld(doc)
    qs = quads_set(quads)
    assert (f"<{EX}a>", f"<{EX}label>", '"hallo"@de', None) in qs
    assert (f"<{EX}a>", f"<{EX}score>", f'"1.5"^^<{EX}dt>', None) in qs
    assert any(p == f"<{T.RDF}first>" for _, p, _, _ in qs)
    assert any(g == f"<{EX}g>" and "true" in o for _, _, o, g in qs)


# --------------------------------------------------------------- read_rdf
@pytest.mark.parametrize(
    "ext,content",
    [
        ("trig", f"<{EX}s> {{ <{EX}a> <{EX}p> <{EX}b> . }}"),
        (
            "rdf",
            f'<rdf:RDF xmlns:rdf="{T.RDF}" xmlns:ex="{EX}">'
            f'<rdf:Description rdf:about="{EX}a"><ex:p rdf:resource="{EX}b"/>'
            f"</rdf:Description></rdf:RDF>",
        ),
        (
            "jsonld",
            '{"@context": {"ex": "http://example.org/"}, "@id": "ex:a",'
            ' "ex:p": {"@id": "ex:b"}}',
        ),
    ],
)
def test_read_rdf_dispatch(spark, tmp_path, ext, content):
    path = tmp_path / f"data.{ext}"
    path.write_text(content)
    df = read_rdf(spark, str(path))
    rows = df.collect()
    assert any(
        r["st"]["lex"] == EX + "a" and r["pt"]["lex"] == EX + "p" and r["ot"]["lex"] == EX + "b"
        for r in rows
    )
