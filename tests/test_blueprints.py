"""Blueprints/TinkerPop property-graph veneer (reference:
``bigdata-blueprints/.../BigdataGraph.java``): RDF mapping parity,
CRUD + traversal, bulk DataFrame ingest, mutation listeners."""

import pytest
from pyspark.sql import functions as F

from database_spark.blueprints import (
    BD_EDGE,
    BD_VERTEX,
    EDGE_NAMESPACE,
    RDF_TYPE,
    VERTEX_NAMESPACE,
    PropertyGraph,
)
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term


@pytest.fixture()
def graph(spark):
    store = TripleStore.from_python_triples(spark, [])
    return PropertyGraph(SparqlEngine(store))


def test_vertex_crud_and_rdf_mapping(graph):
    v = graph.add_vertex("v1")
    assert v.uri == VERTEX_NAMESPACE + "v1"
    # membership statement shape matches DefaultBlueprintsValueFactory
    assert graph.engine.store.has_statement(
        s=Term.iri(v.uri), p=Term.iri(RDF_TYPE), o=Term.iri(BD_VERTEX)
    )
    assert graph.get_vertex("v1") == v
    assert graph.get_vertex("nope") is None

    v.set_property("name", "Alice")
    v.set_property("age", 42)
    v.set_property("score", 2.5)
    v.set_property("active", True)
    assert v.get_property("name") == "Alice"
    assert v.get_property("age") == 42
    assert v.get_property("score") == 2.5
    assert v.get_property("active") is True
    assert v.get_property_keys() == {"name", "age", "score", "active"}

    # setProperty is single-valued: replace, not append
    v.set_property("name", "Bob")
    assert v.get_property("name") == "Bob"
    assert v.remove_property("age") == 42
    assert v.get_property("age") is None


def test_vertex_id_url_encoding_round_trip(graph):
    vid = "has space/and:colon"
    v = graph.add_vertex(vid)
    assert "+" in v.uri or "%" in v.uri
    got = graph.get_vertex(vid)
    assert got is not None and got.id == vid
    ids = [w.id for w in graph.get_vertices()]
    assert ids == [vid]


def test_edge_crud_and_traversal(graph):
    a, b, c = (graph.add_vertex(x) for x in "abc")
    e1 = graph.add_edge("e1", a, b, "knows")
    e2 = graph.add_edge("e2", a, c, "likes")
    e3 = graph.add_edge("e3", c, a, "knows")
    # the edge URI is the PREDICATE of the relationship statement
    assert graph.engine.store.has_statement(
        s=Term.iri(a.uri), p=Term.iri(EDGE_NAMESPACE + "e1"), o=Term.iri(b.uri)
    )
    assert graph.engine.store.has_statement(
        s=Term.iri(e1.uri), o=Term.iri(BD_EDGE)
    )
    got = graph.get_edge("e1")
    assert got.label == "knows"
    assert got.out_vertex.id == "a" and got.in_vertex.id == "b"
    assert graph.get_edge("missing") is None

    assert {e.id for e in a.edges("out")} == {"e1", "e2"}
    assert {e.id for e in a.edges("out", "knows")} == {"e1"}
    assert {e.id for e in a.edges("in")} == {"e3"}
    assert {e.id for e in a.edges("both")} == {"e1", "e2", "e3"}
    assert {v.id for v in a.vertices("out")} == {"b", "c"}
    assert {v.id for v in a.vertices("both", "knows")} == {"b", "c"}

    e1.set_property("weight", 3)
    assert graph.get_edge("e1").get_property("weight") == 3

    graph.remove_edge(e1)
    assert graph.get_edge("e1") is None
    # no dangling edge state: label/type/property statements went too
    assert not graph.engine.store.has_statement(s=Term.iri(e1.uri))


def test_remove_vertex_removes_incident_edge_state(graph):
    a, b = graph.add_vertex("a"), graph.add_vertex("b")
    e = graph.add_edge("e", a, b, "knows")
    e.set_property("w", 1)
    a.set_property("name", "A")
    graph.remove_vertex(a)
    assert graph.get_vertex("a") is None
    assert graph.get_edge("e") is None
    assert not graph.engine.store.has_statement(s=Term.iri(e.uri))
    assert not graph.engine.store.has_statement(s=Term.iri(a.uri))
    # b untouched
    assert graph.get_vertex("b") is not None


def test_property_filtered_lookups(graph):
    for i in range(4):
        v = graph.add_vertex(f"v{i}")
        v.set_property("mod", i % 2)
    es = []
    vs = [graph.get_vertex(f"v{i}") for i in range(4)]
    for i in range(3):
        ei = graph.add_edge(f"e{i}", vs[i], vs[i + 1], "next")
        ei.set_property("tag", "x" if i == 1 else "y")
        es.append(ei)
    assert {v.id for v in graph.get_vertices("mod", 1)} == {"v1", "v3"}
    assert {e.id for e in graph.get_edges("tag", "x")} == {"e1"}
    assert {e.id for e in graph.get_edges()} == {"e0", "e1", "e2"}


def test_bulk_load_dataframes(graph, spark):
    vdf = spark.createDataFrame(
        [("u1", "Ada", 36), ("u2", "Bo b", 29), ("u3", None, 51)],
        "id string, name string, age int",
    )
    edf = spark.createDataFrame(
        [("x1", "u1", "u2", "follows", 0.5), ("x2", "u2", "u3", "blocks", 1.5)],
        "id string, src string, dst string, rel string, weight double",
    )
    graph.bulk_load_vertices(vdf)
    graph.bulk_load_edges(edf, label="rel")
    assert sorted(r["id"] for r in graph.vertices_df().collect()) == ["u1", "u2", "u3"]
    rows = {r["id"]: r for r in graph.edges_df().collect()}
    assert rows["x1"]["out"] == "u1" and rows["x1"]["in"] == "u2"
    assert rows["x1"]["label"] == "follows" and rows["x2"]["label"] == "blocks"
    # column-built URIs match the driver-side factory (form encoding)
    v = graph.get_vertex("u2")
    assert v.get_property("name") == "Bo b"
    assert v.get_property("age") == 29
    assert graph.get_vertex("u3").get_property("name") is None
    e = graph.get_edge("x1")
    assert e.get_property("weight") == 0.5
    # constant-label variant
    edf2 = spark.createDataFrame([("x3", "u3", "u1")], "id string, src string, dst string")
    graph.bulk_load_edges(edf2, label="links")
    assert graph.get_edge("x3").label == "links"


def test_bulk_load_typed_columns(graph, spark):
    from pyspark.sql import functions as F

    vdf = spark.sql(
        "SELECT 'd1' AS id, CAST(12.50 AS DECIMAL(10,2)) AS bal, "
        "CAST('2024-03-01 10:30:00' AS TIMESTAMP) AS seen, "
        "CAST('2024-03-01' AS DATE) AS day, true AS ok"
    )
    graph.bulk_load_vertices(vdf)
    v = graph.get_vertex("d1")
    assert v.get_property("bal") == 12.5  # decimal -> numeric, not string
    assert v.get_property("seen") == "2024-03-01T10:30:00"
    assert v.get_property("day") == "2024-03-01"
    assert v.get_property("ok") is True


def test_bulk_load_encodes_ids_like_driver_side(graph, spark):
    vdf = spark.createDataFrame([("has space/x",)], "id string")
    graph.bulk_load_vertices(vdf)
    v = graph.get_vertex("has space/x")
    assert v is not None
    assert [r["id"] for r in graph.vertices_df().collect()] == ["has space/x"]


def test_graph_query_criteria(graph, spark):
    vdf = spark.createDataFrame(
        [("v1", 10, "x"), ("v2", 20, "y"), ("v3", 30, None), ("v4", 40, "y")],
        "id string, age int, tag string",
    )
    graph.bulk_load_vertices(vdf)
    q = graph.query()
    assert {v.id for v in q.has("age", 20, "gte").has("tag").vertices()} == {"v2", "v4"}
    assert {v.id for v in graph.query().has_not("tag").vertices()} == {"v3"}
    assert {v.id for v in graph.query().interval("age", 20, 40).vertices()} == {"v2", "v3"}
    assert {v.id for v in graph.query().has("tag", "y").vertices()} == {"v2", "v4"}
    assert {v.id for v in graph.query().has_not("tag", "y").vertices()} == {"v1", "v3"}
    assert len(graph.query().has("age", 15, "gt").limit(2).vertices()) == 2
    edf = spark.createDataFrame(
        [("e1", "v1", "v2", 0.5), ("e2", "v2", "v3", 1.5)],
        "id string, src string, dst string, w double",
    )
    graph.bulk_load_edges(edf, label="link")
    hits = graph.query().has("w", 1.0, "gt").edges()
    assert [e.id for e in hits] == ["e2"] and hits[0].label == "link"


def test_history_records_commit_deltas(graph):
    graph.enable_history()
    v = graph.add_vertex("h1")
    v.set_property("p", 1)
    graph.remove_vertex(v)
    edits = graph.history()
    adds = [e for e in edits if e[1] == "add"]
    removes = [e for e in edits if e[1] == "remove"]
    assert any(e[2] == v.uri and e[3] == RDF_TYPE for e in adds)
    assert any(e[2] == v.uri and e[3] == RDF_TYPE for e in removes)
    # commit sequence increases across commits
    assert edits[0][0] < edits[-1][0]
    # filtered form
    assert graph.history([v.uri]) == edits
    assert graph.history([VERTEX_NAMESPACE + "other"]) == []


def test_mutation_listener_sees_graph_edits(graph):
    events = []

    def listener(added, removed):
        events.append(
            (
                {(r["st"]["lex"], r["pt"]["lex"]) for r in added.collect()},
                {(r["st"]["lex"], r["pt"]["lex"]) for r in removed.collect()},
            )
        )

    graph.add_listener(listener)
    v = graph.add_vertex("v")
    assert events and (v.uri, RDF_TYPE) in events[-1][0]
    n = len(events)
    graph.remove_vertex(v)
    assert len(events) > n and (v.uri, RDF_TYPE) in events[-1][1]
    graph.remove_listener(listener)
    graph.add_vertex("w")
    # unsubscribed: no further deliveries
    assert all((VERTEX_NAMESPACE + "w", RDF_TYPE) not in ev[0] for ev in events)


def test_history_stays_distributed_until_read(graph, spark):
    """r5 verdict stretch #10: with history enabled, a bulk load must
    not materialize anything driver-side — deltas are retained as
    checkpointed frames and collected only by the history() READ."""
    import pyspark.sql as psql

    graph.enable_history()
    calls = []
    orig = psql.DataFrame.collect

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    psql.DataFrame.collect = spy
    try:
        vdf = spark.createDataFrame(
            [(f"b{i}", i) for i in range(5)], "id string, n int"
        )
        graph.bulk_load_vertices(vdf)
        assert calls == [], "driver materialization during mutation"
    finally:
        psql.DataFrame.collect = orig
    # frames, not rows, are retained
    assert all(hasattr(e[2], "collect") for e in graph._history)
    edits = graph.history()
    assert len([e for e in edits if e[1] == "add"]) == 10  # 5 type + 5 prop
    # filtered read pushes the predicate into the frame
    u = graph.factory.to_vertex_uri("b3")
    assert {e[2] for e in graph.history([u])} == {u}
    # survives a store compaction cycle (protected checkpoints)
    for i in range(10):
        graph.add_vertex(f"extra{i}")
    assert len(graph.history()) >= 10
    graph.disable_history()
    assert graph._history is None
