"""DataLoaderServlet: POST /dataloader with a properties document
bulk-loads server-side files/directories into a (possibly new)
namespace in one commit.

Reference: ``bigdata-core/bigdata-sails/.../webapp/DataLoaderServlet.java``
(XML java.util.Properties body; fileOrDirs required; namespace
auto-created; defaultGraph optional).
"""

import urllib.error
import urllib.parse
import urllib.request

import pytest

from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture()
def endpoint(spark):
    eng = SparqlEngine(
        TripleStore.from_python_triples(
            spark, [(Term.iri(EX + "seed"), Term.iri(EX + "p"), Term.literal("0"))]
        )
    )
    ep = SparqlEndpoint(eng).start()
    yield ep
    ep.stop()


def _post(url, body, ctype="text/plain"):
    req = urllib.request.Request(
        url, method="POST", data=body.encode(), headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read().decode()


def _count(ep, ns):
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
    url = ep.url.rsplit("/sparql", 1)[0] + f"/namespace/{ns}/sparql"
    req = urllib.request.Request(
        url + "?" + urllib.parse.urlencode({"query": q}),
        headers={"Accept": "text/csv"},
    )
    with urllib.request.urlopen(req) as r:
        return int(r.read().decode().strip().splitlines()[-1])


def test_dataloader_directory_walk_new_namespace(endpoint, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.nt").write_text(
        f'<{EX}a> <{EX}p> "1" .\n<{EX}b> <{EX}p> "2" .\n'
    )
    (tmp_path / "sub" / "b.ttl").write_text(
        f'@prefix ex: <{EX}> . ex:c ex:p "3" .\n'
    )
    (tmp_path / "ignore.txt").write_text("not rdf")
    body = (
        '<?xml version="1.0"?><properties>'
        '<entry key="namespace">bulk</entry>'
        f'<entry key="fileOrDirs">{tmp_path}</entry>'
        '<entry key="quiet">true</entry></properties>'
    )
    base = endpoint.url.rsplit("/", 1)[0]
    status, resp = _post(base + "/dataloader", body, "application/xml")
    assert status == 200 and 'modified="3"' in resp and 'files="2"' in resp
    assert _count(endpoint, "bulk") == 3


def test_dataloader_plain_properties_default_graph(endpoint, tmp_path):
    (tmp_path / "d.nt").write_text(f'<{EX}x> <{EX}p> "9" .\n')
    body = f"fileOrDirs={tmp_path}/d.nt\ndefaultGraph={EX}g1\n"
    base = endpoint.url.rsplit("/", 1)[0]
    status, resp = _post(base + "/dataloader", body)
    assert status == 200 and 'modified="1"' in resp
    # landed in the named graph of the DEFAULT namespace
    q = f"SELECT (COUNT(*) AS ?n) WHERE {{ GRAPH <{EX}g1> {{ ?s ?p ?o }} }}"
    req = urllib.request.Request(
        endpoint.url + "?" + urllib.parse.urlencode({"query": q}),
        headers={"Accept": "text/csv"},
    )
    with urllib.request.urlopen(req) as r:
        assert int(r.read().decode().strip().splitlines()[-1]) == 1


def test_dataloader_errors(endpoint):
    base = endpoint.url.rsplit("/", 1)[0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/dataloader", "namespace=kb\n")
    assert e.value.code == 400 and "fileOrDirs" in e.value.read().decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/dataloader", "fileOrDirs=/does/not/exist\n")
    assert e.value.code == 400
