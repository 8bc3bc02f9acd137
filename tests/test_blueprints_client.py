"""Remote Blueprints client (reference: ``BigdataGraphClient.java``):
the embedded CRUD/traversal/criteria matrix of ``test_blueprints.py``
run through ``PropertyGraphClient`` against a real in-process HTTP
``SparqlEndpoint`` — proving the remote protocol round-trips the same
RDF mapping the embedded veneer writes."""

import pytest

from database_spark.blueprints import (
    BD_EDGE,
    BD_VERTEX,
    EDGE_NAMESPACE,
    RDF_TYPE,
    VERTEX_NAMESPACE,
    PropertyGraph,
)
from database_spark.blueprints_client import PropertyGraphClient
from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term


@pytest.fixture()
def served(spark):
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        yield PropertyGraphClient(ep.url), eng
    finally:
        ep.stop()


def test_client_vertex_crud_and_mapping(served):
    g, eng = served
    v = g.add_vertex("v1")
    assert v.uri == VERTEX_NAMESPACE + "v1"
    # the remote mutation wrote the same membership statement shape
    assert eng.store.has_statement(
        s=Term.iri(v.uri), p=Term.iri(RDF_TYPE), o=Term.iri(BD_VERTEX)
    )
    assert g.get_vertex("v1") == v
    assert g.get_vertex("nope") is None

    v.set_property("name", "Alice")
    v.set_property("age", 42)
    v.set_property("score", 2.5)
    v.set_property("active", True)
    assert v.get_property("name") == "Alice"
    assert v.get_property("age") == 42
    assert v.get_property("score") == 2.5
    assert v.get_property("active") is True
    assert v.get_property_keys() == {"name", "age", "score", "active"}
    v.set_property("name", "Bob")
    assert v.get_property("name") == "Bob"
    assert v.remove_property("age") == 42
    assert v.get_property("age") is None


def test_client_id_encoding_round_trip(served):
    g, _ = served
    vid = "has space/and:colon*~"
    v = g.add_vertex(vid)
    got = g.get_vertex(vid)
    assert got is not None and got.id == vid
    assert [w.id for w in g.get_vertices()] == [vid]


def test_client_edge_crud_and_traversal(served):
    g, eng = served
    a, b, c = (g.add_vertex(x) for x in "abc")
    e1 = g.add_edge("e1", a, b, "knows")
    g.add_edge("e2", a, c, "likes")
    g.add_edge("e3", c, a, "knows")
    assert eng.store.has_statement(
        s=Term.iri(a.uri), p=Term.iri(EDGE_NAMESPACE + "e1"), o=Term.iri(b.uri)
    )
    assert eng.store.has_statement(s=Term.iri(e1.uri), o=Term.iri(BD_EDGE))
    got = g.get_edge("e1")
    assert got.label == "knows"
    assert got.out_vertex.id == "a" and got.in_vertex.id == "b"
    assert g.get_edge("missing") is None

    assert {e.id for e in a.edges("out")} == {"e1", "e2"}
    assert {e.id for e in a.edges("out", "knows")} == {"e1"}
    assert {e.id for e in a.edges("in")} == {"e3"}
    assert {e.id for e in a.edges("both")} == {"e1", "e2", "e3"}
    assert {v.id for v in a.vertices("out")} == {"b", "c"}
    assert {v.id for v in a.vertices("both", "knows")} == {"b", "c"}

    e1.set_property("weight", 3)
    assert g.get_edge("e1").get_property("weight") == 3

    g.remove_edge(e1)
    assert g.get_edge("e1") is None
    assert not eng.store.has_statement(s=Term.iri(e1.uri))


def test_client_remove_vertex_removes_edge_state(served):
    g, eng = served
    a, b = g.add_vertex("a"), g.add_vertex("b")
    e = g.add_edge("e", a, b, "knows")
    e.set_property("w", 1)
    a.set_property("name", "A")
    g.remove_vertex(a)
    assert g.get_vertex("a") is None
    assert g.get_edge("e") is None
    assert not eng.store.has_statement(s=Term.iri(e.uri))
    assert not eng.store.has_statement(s=Term.iri(a.uri))
    assert g.get_vertex("b") is not None


def test_client_property_filtered_lookups(served):
    g, _ = served
    vs = []
    for i in range(4):
        v = g.add_vertex(f"v{i}")
        v.set_property("mod", i % 2)
        vs.append(v)
    for i in range(3):
        ei = g.add_edge(f"e{i}", vs[i], vs[i + 1], "next")
        ei.set_property("tag", "x" if i == 1 else "y")
    assert {v.id for v in g.get_vertices("mod", 1)} == {"v1", "v3"}
    assert {e.id for e in g.get_edges("tag", "x")} == {"e1"}
    assert {e.id for e in g.get_edges()} == {"e0", "e1", "e2"}


def test_client_criteria(served):
    g, _ = served
    for vid, age, tag in [
        ("v1", 10, "x"), ("v2", 20, "y"), ("v3", 30, None), ("v4", 40, "y")
    ]:
        v = g.add_vertex(vid)
        v.set_property("age", age)
        if tag is not None:
            v.set_property("tag", tag)
    q = g.query()
    assert {v.id for v in q.has("age", 20, "gte").has("tag").vertices()} == {"v2", "v4"}
    assert {v.id for v in g.query().has_not("tag").vertices()} == {"v3"}
    assert {v.id for v in g.query().interval("age", 20, 40).vertices()} == {"v2", "v3"}
    assert {v.id for v in g.query().has("tag", "y").vertices()} == {"v2", "v4"}
    assert {v.id for v in g.query().has_not("tag", "y").vertices()} == {"v1", "v3"}
    assert len(g.query().has("age", 15, "gt").limit(2).vertices()) == 2

    e1 = g.add_edge("e1", g.get_vertex("v1"), g.get_vertex("v2"), "link")
    e2 = g.add_edge("e2", g.get_vertex("v2"), g.get_vertex("v3"), "link")
    e1.set_property("w", 0.5)
    e2.set_property("w", 1.5)
    hits = g.query().has("w", 1.0, "gt").edges()
    assert [e.id for e in hits] == ["e2"] and hits[0].label == "link"


def test_client_and_embedded_interoperate(served):
    """Elements written by the embedded veneer are visible through the
    remote client and vice versa — same factory mapping (the reference
    client/embedded pair share DefaultBlueprintsValueFactory)."""
    g, eng = served
    emb = PropertyGraph(eng)
    ev = emb.add_vertex("emb1")
    ev.set_property("name", "embedded")
    got = g.get_vertex("emb1")
    assert got is not None and got.get_property("name") == "embedded"
    rv = g.add_vertex("rem1")
    rv.set_property("name", "remote")
    back = emb.get_vertex("rem1")
    assert back is not None and back.get_property("name") == "remote"
