"""StatusServlet surface: /status page, counters, running-query table,
health probe, and cancelQuery killing the query's Spark job group.

Reference: ``bigdata-core/bigdata-sails/.../webapp/StatusServlet.java``
(SHOW_QUERIES / CANCEL_QUERY / QUERY_ID / health).
"""

import threading
import time
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
    trips = [
        (Term.iri(EX + f"s{i}"), Term.iri(EX + "p"), Term.literal(str(i)))
        for i in range(4)
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    ep = SparqlEndpoint(eng).start()
    yield ep
    ep.stop()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read().decode()


def _base(ep):
    return ep.url.rsplit("/", 1)[0]


def test_status_page_counters_and_namespaces(endpoint):
    # run one query so the accepted counter moves
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
    _get(endpoint.url + "?" + urllib.parse.urlencode({"query": q}))
    status, ctype, body = _get(_base(endpoint) + "/status")
    assert status == 200 and "html" in ctype
    assert "Accepted query count=" in body
    assert "Running query count=0" in body
    status, _, body = _get(_base(endpoint) + "/status?showNamespaces")
    assert "<li>kb</li>" in body


def test_status_health(endpoint):
    import json

    status, ctype, body = _get(_base(endpoint) + "/status?health")
    assert status == 200 and "json" in ctype
    got = json.loads(body)
    assert got["status"] == "Good"


def test_show_queries_and_cancel(endpoint, spark):
    """A running query appears in showQueries (with its text under
    details) and cancelQuery&queryId= kills its Spark job group — the
    held job must fail promptly instead of running to completion."""
    qid = "cancel-me-123"
    state = {}

    def victim():
        with endpoint._track_query("SELECT * WHERE { huge }", qid, "/sparql"):
            try:
                # a job far too large to finish: cancellation must
                # interrupt it (job group set by _track_query)
                spark.range(1 << 40).selectExpr("sum(id % 1000)").collect()
                state["outcome"] = "completed"
            except Exception:  # noqa: BLE001 — cancellation error
                state["outcome"] = "cancelled"

    def running():
        # the registry is keyed by server-minted ids; the client
        # queryId is a display/cancel-lookup attribute
        return any(q["queryId"] == qid for q in endpoint._running.values())

    t = threading.Thread(target=victim, daemon=True)
    t.start()
    # wait until it registers
    for _ in range(100):
        if running():
            break
        time.sleep(0.05)
    assert running()

    _, _, body = _get(_base(endpoint) + "/status?showQueries=details")
    assert qid in body and "huge" in body

    status, _, _ = _get(
        _base(endpoint)
        + "/status?cancelQuery&"
        + urllib.parse.urlencode({"queryId": qid})
    )
    assert status == 200
    t.join(timeout=60)
    assert not t.is_alive(), "cancelled job still running after 60s"
    assert state["outcome"] == "cancelled"
    assert not running()


def test_backup_roundtrip(endpoint, spark, tmp_path):
    """BackupServlet: POST /backup?file= writes a loadable snapshot of
    the current commit point; existing targets are refused 409."""
    import urllib.error

    from database_spark.store import TripleStore

    target = str(tmp_path / "backup.parquet")
    data = urllib.parse.urlencode({"file": target}).encode()
    req = urllib.request.Request(
        _base(endpoint) + "/backup",
        method="POST",
        data=data,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert f'file="{target}"' in r.read().decode()
    restored = TripleStore.load(spark, target)
    assert restored.df.count() == 4
    # second attempt at the same path → 409
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            urllib.request.Request(
                _base(endpoint) + "/backup",
                method="POST",
                data=data,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
        )
    assert e.value.code == 409


def test_format_param_overrides_accept(endpoint):
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
    url = endpoint.url + "?" + urllib.parse.urlencode({"query": q, "format": "csv"})
    req = urllib.request.Request(url, headers={"Accept": "application/sparql-results+json"})
    with urllib.request.urlopen(req) as r:
        assert "csv" in r.headers.get("Content-Type", "")
        assert r.read().decode().strip().splitlines()[-1] == "4"


def test_query_deadline_times_out(endpoint, spark):
    """?timeout= (reference QueryServlet maxQueryTime surface): when the
    query's Spark jobs outlive the deadline, the timer cancels the job
    group and the endpoint replies 503.

    The victim work is a huge spark.range aggregation injected through
    evaluate() rather than a SPARQL cross product: cancellation lands at
    task interruption checks, and a broadcast-nested-loop cross join
    compiles to ONE codegen task with no such check (a Spark codegen
    property) — scan-shaped plans, which real queries are made of,
    cancel fine."""
    import urllib.error

    real = endpoint.evaluate

    def slow_evaluate(query, accept="", engine=None, **kw):
        spark.range(1 << 40).selectExpr("sum(id % 1000)").collect()
        return real(query, accept, engine, **kw)

    endpoint.evaluate = slow_evaluate
    errored_before = endpoint._queries_errored
    done_before = endpoint._queries_done
    try:
        q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
        url = endpoint.url + "?" + urllib.parse.urlencode(
            {"query": q, "timeout": "1"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(url, timeout=120)
        assert e.value.code == 503
        assert "deadline" in e.value.read().decode()
        # the timed-out query counts as ERRORED in /counters, not done
        assert endpoint._queries_errored == errored_before + 1
        assert endpoint._queries_done == done_before
    finally:
        endpoint.evaluate = real


def test_include_inferred_false(spark):
    """includeInferred=false evaluates over EXPLICIT statements only
    (StatementEnum filter), and refuses updates (read-only view)."""
    from database_spark.terms import Term as T2

    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    trips = [
        (T2.iri(EX + "Dog"), T2.iri(RDFS + "subClassOf"), T2.iri(EX + "Animal")),
        (T2.iri(EX + "rex"), T2.iri(RDF + "type"), T2.iri(EX + "Dog")),
    ]
    eng = SparqlEngine(
        TripleStore.from_python_triples(spark, trips), maintain_entailments=True
    )
    eng.update(f'INSERT DATA {{ <{EX}fido> <{RDF}type> <{EX}Dog> }}')
    ep = SparqlEndpoint(eng).start()
    try:
        q = (f"SELECT (COUNT(*) AS ?n) WHERE {{ ?s <{RDF}type> "
             f"<{EX}Animal> }}")

        def run(extra):
            url = ep.url + "?" + urllib.parse.urlencode(
                {"query": q, "format": "csv", **extra})
            with urllib.request.urlopen(url) as r:
                return int(r.read().decode().strip().splitlines()[-1])

        assert run({}) == 2  # rex + fido inferred Animal
        assert run({"includeInferred": "false"}) == 0
        assert run({"includeInferred": "true"}) == 2

        # GETSTMTS honors the same flag (getStatements includeInferred)
        def stmts(extra):
            url = ep.url + "?" + urllib.parse.urlencode(
                {"GETSTMTS": "", "p": f"<{RDF}type>", **extra})
            with urllib.request.urlopen(url) as r:
                return r.read().decode()

        assert f"<{EX}Animal>" in stmts({})  # inferred types exported
        assert f"<{EX}Animal>" not in stmts({"includeInferred": "false"})
        assert f"<{EX}Dog>" in stmts({"includeInferred": "false"})
    finally:
        ep.stop()
