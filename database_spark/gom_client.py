"""Remote GOM: the Generic Object Model driven over the SPARQL 1.1
Protocol instead of an embedded engine.

Reference: ``bigdata-core/bigdata-gom/src/java/com/bigdata/gom/om/
NanoSparqlObjectManager.java`` — an ``IObjectManager`` whose
``evaluate``/``evaluateGraph`` prepare remote queries against a
``RemoteRepository`` and whose ``flushStatements`` ships each staged
batch as ONE remote update (``RemoteRepository.update(RemoveOp,
AddOp)``), inheriting all GPO caching/staging from ``ObjectMgrModel``.
Tests: ``bigdata-core-test/bigdata-gom/src/test/com/bigdata/gom/
TestRemoteGOM.java``.

This module mirrors that split exactly: :class:`RemoteObjectManager`
subclasses the embedded :class:`~database_spark.gom.ObjectManager` and
overrides ONLY the engine-touching methods — canonical weak-value GPO
cache, staged mutations, native transactions, skins and the OWL
alchemy layer are inherited verbatim, so the same application code
runs embedded or remote (the reference's ``IObjectManager`` contract).

Protocol mapping:

* ``materialize(gpo)`` — one SELECT shipping the object's forward
  statements and reverse links in a single round trip (the reference
  materializes a GPO with one DESCRIBE-shaped query per fault).
* ``evaluate`` — remote SELECT, rows of {var: Term} (the remote analog
  of the reference's BindingSet iterator; there is no DataFrame on the
  client side by design — the client is Spark-free).
* ``evaluate_graph`` — remote CONSTRUCT/DESCRIBE negotiated as
  N-Triples and parsed client-side.
* ``_flush`` — one ``;``-chained ``DELETE DATA ; INSERT DATA`` update
  request per flush batch: removes-then-adds, the
  ``flushStatementBuffers`` ordering, applied by the server as a
  single commit — identical changeset granularity to embedded GOM.
* ``save``/``recall`` — named roots via one update / one SELECT.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from .gom import NAME_PROPERTY, GPO, ObjectManager
from .rio.reader import parse_nt_line
from .terms import KIND_IRI, Term


def _json_term(b: dict) -> Term:
    """SPARQL-results-JSON binding → Term."""
    t = b["type"]
    if t == "uri":
        return Term.iri(b["value"])
    if t == "bnode":
        return Term.bnode(b["value"])
    if "xml:lang" in b:
        return Term.literal(b["value"], lang=b["xml:lang"])
    return Term.literal(b["value"], dt=b.get("datatype"))


class RemoteObjectManager(ObjectManager):
    """``NanoSparqlObjectManager`` analog: GOM over HTTP.  ``url`` is
    the sparql resource (``http://host:port/sparql`` or a
    ``/namespace/<ns>/sparql``)."""

    def __init__(self, url: str):
        super().__init__(engine=None)
        self.url = url

    # --------------------------------------------------------- protocol
    def _select(self, query: str) -> list:
        q = urllib.parse.urlencode({"query": query})
        req = urllib.request.Request(
            f"{self.url}?{q}",
            headers={"Accept": "application/sparql-results+json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())["results"]["bindings"]

    def _post_update(self, text: str) -> None:
        data = urllib.parse.urlencode({"update": text}).encode()
        req = urllib.request.Request(self.url, data=data, method="POST")
        urllib.request.urlopen(req).read()

    # ------------------------------------------------- IObjectManager
    def materialize(self, gpo: GPO) -> None:
        """One remote SELECT per object fault: forward statements where
        the object is subject, reverse links where it is object (the
        per-GPO set the reference's remote materialization ships)."""
        iri = f"<{gpo.iri}>"
        rows = self._select(
            f"SELECT ?p ?o ?rs ?rp WHERE {{ "
            f"{{ {iri} ?p ?o }} UNION {{ ?rs ?rp {iri} }} }}"
        )
        fwd: dict = {}
        rev: dict = {}
        for r in rows:
            if "p" in r:
                fwd.setdefault(r["p"]["value"], []).append(_json_term(r["o"]))
            else:
                rev.setdefault(r["rp"]["value"], []).append(r["rs"]["value"])
        gpo._forward, gpo._reverse = fwd, rev

    def evaluate(self, query: str) -> list:
        """Remote SELECT → list of {var: Term} rows (the reference's
        remote BindingSet iterator shape)."""
        return [
            {v: _json_term(b) for v, b in row.items()} for row in self._select(query)
        ]

    def evaluate_graph(self, query: str) -> list:
        """Remote CONSTRUCT/DESCRIBE → list of (s, p, o) Terms,
        negotiated as N-Triples."""
        q = urllib.parse.urlencode({"query": query})
        req = urllib.request.Request(
            f"{self.url}?{q}", headers={"Accept": "application/n-triples"}
        )
        with urllib.request.urlopen(req) as r:
            text = r.read().decode()
        out = []
        for line in text.splitlines():
            st = parse_nt_line(line)
            if st is not None:
                out.append((st[0], st[1], st[2]))
        return out

    def execute(self, update: str) -> None:
        self._post_update(update)
        self._invalidate()

    # ---------------------------------------------------- named roots
    def save(self, key: str, value: Term) -> None:
        self._post_update(
            f"DELETE WHERE {{ <{key}> <{NAME_PROPERTY}> ?o }} ; "
            f"INSERT DATA {{ <{key}> <{NAME_PROPERTY}> {value.n3()} }}"
        )
        self._invalidate()

    def recall(self, key: str) -> Term | None:
        rows = self._select(
            f"SELECT ?o WHERE {{ <{key}> <{NAME_PROPERTY}> ?o }} LIMIT 1"
        )
        return _json_term(rows[0]["o"]) if rows else None

    def recall_as_gpo(self, key: str) -> GPO | None:
        t = self.recall(key)
        return self.get_gpo(t.lex) if t is not None and t.kind == KIND_IRI else None

    # ---------------------------------------------------------- flush
    def _flush(self) -> None:
        """One remote update per flush batch (removes then adds — the
        ``RemoteRepository.update(RemoveOp, AddOp)`` shape), applied by
        the server as a single commit."""
        removes, adds = self._removes, self._adds
        self._adds, self._removes = [], []
        parts = []
        if removes:
            body = " . ".join(f"{s.n3()} {p.n3()} {o.n3()}" for s, p, o, _ in removes)
            parts.append(f"DELETE DATA {{ {body} }}")
        if adds:
            body = " . ".join(f"{s.n3()} {p.n3()} {o.n3()}" for s, p, o, _ in adds)
            parts.append(f"INSERT DATA {{ {body} }}")
        if parts:
            self._post_update(" ; ".join(parts))
