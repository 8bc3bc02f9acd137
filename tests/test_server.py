"""SPARQL 1.1 Protocol endpoint (reference: QueryServlet.java:122-265,
UpdateServlet — the NanoSparqlServer REST surface)."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture(scope="module")
def endpoint(spark):
    name = Term.iri(EX + "name")
    trips = [
        (Term.iri(EX + "a"), name, Term.literal("Alice")),
        (Term.iri(EX + "b"), name, Term.literal("Bob")),
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    ep = SparqlEndpoint(eng).start()
    yield ep
    ep.stop()


def _get(url, params, accept="application/sparql-results+json"):
    req = urllib.request.Request(
        url + "?" + urllib.parse.urlencode(params), headers={"Accept": accept}
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get("Content-Type"), r.read().decode()


def test_select_json(endpoint):
    q = f'PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?s ex:name ?n }} ORDER BY ?n'
    status, ctype, body = _get(endpoint.url, {"query": q})
    assert status == 200 and "json" in ctype
    got = json.loads(body)
    assert [b["n"]["value"] for b in got["results"]["bindings"]] == [
        "Alice", "Bob"
    ]


def test_ask_and_negotiation(endpoint):
    q = f'PREFIX ex: <{EX}> ASK {{ ?s ex:name "Alice" }}'
    _, _, body = _get(endpoint.url, {"query": q})
    assert json.loads(body)["boolean"] is True
    _, ctype, body = _get(
        endpoint.url, {"query": q}, accept="application/sparql-results+xml"
    )
    assert "xml" in ctype and "<boolean>true</boolean>" in body


def test_construct_ntriples(endpoint):
    q = f'PREFIX ex: <{EX}> CONSTRUCT {{ ?s ex:tag "x" }} WHERE {{ ?s ex:name ?n }}'
    status, ctype, body = _get(endpoint.url, {"query": q})
    assert status == 200 and ctype.startswith("application/n-triples")
    assert body.count(" .") == 2 and "<http://example.org/tag>" in body


def test_update_via_post_then_query(endpoint):
    upd = f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:name "Carol" }}'
    data = urllib.parse.urlencode({"update": upd}).encode()
    req = urllib.request.Request(endpoint.url, data=data, method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    q = f'PREFIX ex: <{EX}> SELECT ?n WHERE {{ ex:c ex:name ?n }}'
    _, _, body = _get(endpoint.url, {"query": q})
    assert [b["n"]["value"] for b in json.loads(body)["results"]["bindings"]] == [
        "Carol"
    ]


def test_raw_sparql_query_body(endpoint):
    q = f'PREFIX ex: <{EX}> SELECT (COUNT(*) AS ?c) WHERE {{ ?s ex:name ?n }}'
    req = urllib.request.Request(
        endpoint.url,
        data=q.encode(),
        method="POST",
        headers={"Content-Type": "application/sparql-query"},
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read().decode())
    # 2 fixture rows, +1 if the update test already ran in this module
    assert got["results"]["bindings"][0]["c"]["value"] in ("2", "3")


def test_bad_query_is_400(endpoint):
    try:
        _get(endpoint.url, {"query": "SELECT WHERE this is not sparql"})
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_estcard_hasstmt_contexts(spark):
    """REST probes (reference QueryServlet.java:122-265 ESTCARD/HASSTMT,
    and the CONTEXTS servlet)."""
    import xml.etree.ElementTree as ET

    from database_spark.terms import Term as T2

    name = T2.iri(EX + "name")
    g1 = T2.iri(EX + "g1")
    quads = [
        (T2.iri(EX + "a"), name, T2.literal("Alice"), None),
        (T2.iri(EX + "b"), name, T2.literal("Bob"), g1),
        (T2.iri(EX + "b"), T2.iri(EX + "age"), T2.integer(7), g1),
    ]
    from database_spark.store import TripleStore as TS

    st = TS.from_python_triples(spark, quads)
    ep = SparqlEndpoint(SparqlEngine(st)).start()
    try:
        status, ctype, body = _get(ep.url, {"ESTCARD": "", "p": f"<{EX}name>"})
        assert status == 200 and "xml" in ctype
        assert ET.fromstring(body).get("rangeCount") == "2"
        status, _, body = _get(ep.url, {"ESTCARD": ""})
        assert ET.fromstring(body).get("rangeCount") == "3"
        status, _, body = _get(
            ep.url, {"HASSTMT": "", "s": f"<{EX}a>", "o": '"Alice"'}
        )
        assert ET.fromstring(body).get("result") == "true"
        status, _, body = _get(ep.url, {"HASSTMT": "", "s": f"<{EX}zzz>"})
        assert ET.fromstring(body).get("result") == "false"
        status, _, body = _get(ep.url, {"CONTEXTS": ""})
        uris = [c.get("uri") for c in ET.fromstring(body)]
        assert uris == [EX + "g1"]
    finally:
        ep.stop()


def test_multitenancy_namespaces(spark):
    """MultiTenancyServlet surface: create/list/delete namespaces and
    per-namespace /namespace/<ns>/sparql routing with isolated stores."""
    import urllib.error
    import urllib.request
    import xml.etree.ElementTree as ET

    from database_spark.terms import Term as T2

    name = T2.iri(EX + "name")
    eng = SparqlEngine(
        TripleStore.from_python_triples(
            spark, [(T2.iri(EX + "a"), name, T2.literal("Alice"))]
        )
    )
    ep = SparqlEndpoint(eng).start()
    base = ep.url.rsplit("/", 1)[0]
    try:
        # create
        req = urllib.request.Request(
            base + "/namespace",
            data=urllib.parse.urlencode({"name": "tenant1"}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        assert urllib.request.urlopen(req).status == 201
        # list
        with urllib.request.urlopen(base + "/namespace") as r:
            names = [n.get("name") for n in ET.fromstring(r.read().decode())]
        assert names == ["kb", "tenant1"]
        # tenant1 starts empty and is isolated from kb
        q = f"PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?s ex:name ?n }}"
        import json as _json

        def ask(ns_url):
            with urllib.request.urlopen(
                ns_url + "?" + urllib.parse.urlencode({"query": q})
            ) as r:
                doc = _json.loads(r.read().decode())
            return [b["n"]["value"] for b in doc["results"]["bindings"]]

        assert ask(base + "/namespace/tenant1/sparql") == []
        assert ask(ep.url) == ["Alice"]
        # update routed to tenant1 only
        upd = f'PREFIX ex: <{EX}> INSERT DATA {{ ex:t ex:name "Tina" }}'
        req = urllib.request.Request(
            base + "/namespace/tenant1/sparql",
            data=urllib.parse.urlencode({"update": upd}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        assert urllib.request.urlopen(req).status == 200
        assert ask(base + "/namespace/tenant1/sparql") == ["Tina"]
        assert ask(ep.url) == ["Alice"]
        # unknown namespace -> 404
        try:
            ask(base + "/namespace/nope/sparql")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # delete
        req = urllib.request.Request(
            base + "/namespace/tenant1", method="DELETE"
        )
        assert urllib.request.urlopen(req).status == 200
        # default namespace protected
        req = urllib.request.Request(base + "/namespace/kb", method="DELETE")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
    finally:
        ep.stop()


def test_graph_negotiation_rdfxml_jsonld(endpoint):
    q = f"PREFIX ex: <{EX}> CONSTRUCT {{ ?s ex:name ?o }} WHERE {{ ?s ex:name ?o }}"
    status, ctype, body = _get(endpoint.url, {"query": q}, accept="application/rdf+xml")
    assert status == 200 and ctype.startswith("application/rdf+xml")
    assert body.startswith('<?xml version="1.0"') and "rdf:Description" in body
    status, ctype, body = _get(endpoint.url, {"query": q}, accept="application/ld+json")
    assert status == 200 and ctype.startswith("application/ld+json")
    assert json.loads(body)["@graph"]


# ----------------------------- direct data endpoints (Insert/DeleteServlet)


def _req(url, method, body=None, ctype=None):
    req = urllib.request.Request(
        url,
        data=body.encode() if body is not None else None,
        method=method,
        headers={"Content-Type": ctype} if ctype else {},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as ex:
        return ex.code, ex.read().decode()


def _modified(body: str) -> int:
    import re

    return int(re.search(r'modified="(\d+)"', body).group(1))


def test_direct_data_post_turtle_and_nt_then_delete(spark):
    """InsertServlet POST-with-body + DeleteServlet access-path/body
    round-trip over real HTTP (VERDICT r4 Next #5)."""
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        ttl = (
            f"@prefix ex: <{EX}> .\n"
            'ex:x ex:name "X" .\n'
            'ex:y ex:name "Y" .\n'
        )
        st, body = _req(ep.url, "POST", ttl, "text/turtle")
        assert st == 200 and _modified(body) == 2
        # N-Triples: one new statement + one duplicate → modified=1
        nt = (
            f'<{EX}z> <{EX}name> "Z" .\n'
            f'<{EX}x> <{EX}name> "X" .\n'
        )
        st, body = _req(ep.url, "POST", nt, "application/n-triples")
        assert st == 200 and _modified(body) == 1
        st, _, out = _get(ep.url, {"query": "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"})
        assert json.loads(out)["results"]["bindings"][0]["n"]["value"] == "3"

        # access-path delete: all statements about ex:x
        st, body = _req(ep.url + "?" + urllib.parse.urlencode({"s": f"<{EX}x>"}), "DELETE")
        assert st == 200 and _modified(body) == 1
        # body delete: remove ex:y by document
        st, body = _req(ep.url, "DELETE", f'<{EX}y> <{EX}name> "Y" .\n', "application/n-triples")
        assert st == 200 and _modified(body) == 1
        st, _, out = _get(ep.url, {"query": "SELECT ?s WHERE { ?s ?p ?o }"})
        vals = [b["s"]["value"] for b in json.loads(out)["results"]["bindings"]]
        assert vals == [EX + "z"]
    finally:
        ep.stop()


def test_direct_data_post_context_uri_and_bad_type(spark):
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        nt = f'<{EX}a> <{EX}p> "v" .\n'
        url = ep.url + "?" + urllib.parse.urlencode({"context-uri": EX + "g1"})
        st, body = _req(url, "POST", nt, "application/n-triples")
        assert st == 200 and _modified(body) == 1
        st, _, out = _get(
            ep.url,
            {"query": f"SELECT ?g WHERE {{ GRAPH ?g {{ <{EX}a> ?p ?o }} }}"},
        )
        assert [b["g"]["value"] for b in json.loads(out)["results"]["bindings"]] == [
            EX + "g1"
        ]
        # unknown RDF content type → 400
        st, _body = _req(ep.url, "POST", "junk", "application/vnd.unknown")
        assert st == 400
    finally:
        ep.stop()


def test_insert_with_uris(spark, tmp_path):
    """InsertServlet.doPostWithURIs: POST ?uri=file:///... loads the
    documents server-side into the addressed namespace."""
    f1 = tmp_path / "d1.ttl"
    f1.write_text(f'@prefix ex: <{EX}> . ex:m ex:name "M" .\n')
    f2 = tmp_path / "d2.nt"
    f2.write_text(f'<{EX}n> <{EX}name> "N" .\n')
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        body = urllib.parse.urlencode(
            [("uri", f"file://{f1}"), ("uri", f"file://{f2}")]
        )
        st, resp = _req(ep.url, "POST", body, "application/x-www-form-urlencoded")
        assert st == 200 and _modified(resp) == 2
        st, _, out = _get(ep.url, {"query": "SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s"})
        vals = [b["s"]["value"] for b in json.loads(out)["results"]["bindings"]]
        assert vals == [EX + "m", EX + "n"]
    finally:
        ep.stop()


def test_explain_query_parameter(spark, sf_dir):
    """?explain (QueryServlet.java:799-813 explainQuery): the response
    is the compiled algebra + Catalyst physical plan instead of
    results, with pushdown evidence for the bucketed store scan."""
    import __spark_entry__ as E

    eng = E._graph(spark, sf_dir)
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        q = (
            "PREFIX t: <urn:tpch:> SELECT ?n WHERE "
            "{ ?s a t:Nation ; t:name ?n }"
        )
        status, ctype, body = _get(
            ep.url, {"query": q, "explain": ""}, accept="text/plain"
        )
        assert status == 200 and ctype.startswith("text/plain")
        assert "Physical plan" in body and "Parsed algebra" in body
        # pushdown evidence on the bucketed predicate store
        assert "PushedFilters" in body or "PartitionFilters" in body
        # a normal query on the same endpoint still returns results
        status, _, body = _get(ep.url, {"query": q})
        assert status == 200 and "bindings" in body
    finally:
        ep.stop()


def test_getstmts_and_service_description(spark):
    """GETSTMTS access-path export + bare-GET service description
    (QueryServlet doGetStmts / doServiceDescription)."""
    triples = [
        (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("x")),
        (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal("y")),
        (Term.iri(EX + "b"), Term.iri(EX + "q"), Term.literal("z")),
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, triples))
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        url = ep.url + "?" + urllib.parse.urlencode(
            {"GETSTMTS": "", "s": f"<{EX}b>"}
        )
        with urllib.request.urlopen(url) as r:
            body = r.read().decode()
            assert r.headers.get_content_type() == "application/n-triples"
        assert body.count("\n") == 2 and f"<{EX}q>" in body and f"<{EX}a>" not in body
        # turtle negotiation
        req = urllib.request.Request(url, headers={"Accept": "text/turtle"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get_content_type() == "text/turtle"
        # bare GET → service description
        with urllib.request.urlopen(ep.url) as r:
            sd = r.read().decode()
            assert r.headers.get_content_type() == "text/turtle"
        assert "sd:Service" in sd and "sd:SPARQL11Query" in sd
        # UUID mint
        with urllib.request.urlopen(ep.url + "?UUID") as r:
            assert r.read().decode().startswith("urn:uuid:")
    finally:
        ep.stop()


def test_concurrent_updates_serialize(spark):
    """Concurrent POST updates must serialize per engine (the reference
    serializes writers on the unisolated connection): N threads each
    insert a distinct statement; all N must land."""
    import threading

    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    ep = SparqlEndpoint(eng).start()
    try:
        def post(i):
            data = urllib.parse.urlencode(
                {"update": f'INSERT DATA {{ <{EX}s{i}> <{EX}p> "{i}" }}'}
            ).encode()
            req = urllib.request.Request(
                ep.url, method="POST", data=data,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
            urllib.request.urlopen(req).read()

        threads = [
            threading.Thread(target=post, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
        req = urllib.request.Request(
            ep.url + "?" + urllib.parse.urlencode({"query": q}),
            headers={"Accept": "text/csv"},
        )
        with urllib.request.urlopen(req) as r:
            assert int(r.read().decode().strip().splitlines()[-1]) == 6
    finally:
        ep.stop()
