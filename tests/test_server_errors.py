"""Protocol error paths: every malformed request gets a clean 4xx —
never a hang, a 500, or a torn response (BigdataRDFServlet's
launderThrowable discipline)."""

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
    eng = SparqlEngine(
        TripleStore.from_python_triples(
            spark, [(Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("x"))]
        )
    )
    ep = SparqlEndpoint(eng).start()
    yield ep
    ep.stop()


def _code(url, data=None, headers=None, method=None):
    req = urllib.request.Request(
        url, data=data, headers=headers or {}, method=method
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def _base(ep):
    return ep.url.rsplit("/", 1)[0]


@pytest.mark.parametrize(
    "query",
    [
        "SELECT ?x WHERE",                      # truncated
        "NONSENSE ?x ?y ?z",                     # not SPARQL
        "SELECT * WHERE { ?s ?p ?o } GARBAGE",  # trailing junk
        "",                                       # empty
    ],
)
def test_malformed_queries_get_400(endpoint, query):
    url = endpoint.url + "?" + urllib.parse.urlencode({"query": query})
    assert _code(url) == 400


def test_malformed_params_get_4xx(endpoint):
    base = _base(endpoint)
    q = "SELECT * WHERE { ?s ?p ?o }"
    # non-numeric limit/offset/timeout
    for extra in ({"limit": "abc"}, {"offset": "x"}, {"timeout": "soon"}):
        url = endpoint.url + "?" + urllib.parse.urlencode(
            {"query": q, **extra}
        )
        assert _code(url) == 400, extra
    # malformed GETSTMTS term
    url = endpoint.url + "?" + urllib.parse.urlencode(
        {"GETSTMTS": "", "s": "not a term"}
    )
    assert _code(url) == 400
    # bad counters params
    assert _code(base + "/counters?filter=(") == 400
    assert _code(base + "/counters?depth=x") == 400
    # unknown namespace routes
    assert _code(base + "/namespace/nope/sparql?"
                 + urllib.parse.urlencode({"query": q})) == 404
    assert _code(base + "/namespace/nope/properties") == 404
    # bad tx ids
    assert _code(base + "/tx/notanumber") == 400
    assert _code(base + "/tx/999999") == 404


def test_update_error_paths(endpoint):
    # update over GET is rejected (CSRF/prefetch hazard)
    url = endpoint.url + "?" + urllib.parse.urlencode(
        {"update": "INSERT DATA { <urn:a> <urn:b> <urn:c> }"}
    )
    assert _code(url) == 405
    # malformed update body over POST
    assert _code(
        endpoint.url,
        data=urllib.parse.urlencode({"update": "INSERT GARBAGE"}).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    ) == 400
    # unparseable RDF body
    assert _code(
        endpoint.url,
        data=b"this is not turtle @@@",
        headers={"Content-Type": "text/turtle"},
    ) == 400
    # duplicate namespace create → 409, bad name → 400
    assert _code(
        _base(endpoint) + "/namespace",
        data=b"com.bigdata.rdf.sail.namespace=kb\n",
        headers={"Content-Type": "text/plain"},
    ) == 409
    assert _code(
        _base(endpoint) + "/namespace",
        data=b"com.bigdata.rdf.sail.namespace=bad name!\n",
        headers={"Content-Type": "text/plain"},
    ) == 400


def test_server_alive_after_error_burst(endpoint):
    """After the 4xx barrage the endpoint still answers correctly."""
    url = endpoint.url + "?" + urllib.parse.urlencode(
        {"query": "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",
         "format": "csv"}
    )
    with urllib.request.urlopen(url, timeout=60) as r:
        assert r.read().decode().strip().splitlines()[-1] == "1"
