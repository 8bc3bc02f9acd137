"""Minimal SPARQL 1.1 Protocol endpoint over a :class:`SparqlEngine`.

Reference: the NanoSparqlServer servlet stack —
``SAILS/webapp/QueryServlet.java:122-265`` (query dispatch + content
negotiation), ``UpdateServlet`` (SPARQL UPDATE via POST), and
``RESTServlet`` routing.  This module re-expresses the PROTOCOL
surface only (the semantics all live in the engine); it is stdlib
``http.server`` based so it carries no dependencies, and it is meant
for driver-side serving of an interactive endpoint — at scale you
would put any HTTP fleet in front of the same engine object since
queries are stateless.

Supported, mirroring the reference's servlet API:

* ``GET /sparql?query=...`` and ``POST /sparql`` with either an
  ``application/x-www-form-urlencoded`` ``query=`` / ``update=`` body
  or a raw ``application/sparql-query`` / ``application/sparql-update``
  body.
* Content negotiation for SELECT/ASK results: JSON (default), XML,
  CSV, TSV; CONSTRUCT/DESCRIBE always stream N-Triples.
* ``?query=`` errors return 400 with the parser/compiler message —
  same contract as the reference's BigdataRDFServlet error path.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

RESULT_MEDIA = {
    "application/sparql-results+json": "json",
    "application/json": "json",
    "application/sparql-results+xml": "xml",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
}

CONTENT_TYPES = {
    "json": "application/sparql-results+json",
    "xml": "application/sparql-results+xml",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
}


def _negotiate(accept: str) -> str:
    for part in (accept or "").split(","):
        fmt = RESULT_MEDIA.get(part.split(";")[0].strip().lower())
        if fmt:
            return fmt
    return "json"


class SparqlEndpoint:
    """An HTTP endpoint bound to one engine instance.

    >>> ep = SparqlEndpoint(engine); ep.start()   # doctest: +SKIP
    ... requests.get(ep.url, params={"query": "SELECT ..."})
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        endpoint = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: str, ctype: str):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype + "; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _run(self, params: dict, allow_update: bool = True):
                accept = self.headers.get("Accept", "")
                try:
                    # ---- REST probes (QueryServlet.java:122-265):
                    # ESTCARD (fast range count), HASSTMT (limit-1
                    # existence), CONTEXTS (distinct graphs).  All
                    # read-only, so legal on GET and POST.
                    if "ESTCARD" in params:
                        body = endpoint.estcard(params)
                        self._reply(200, body, "application/xml")
                        return
                    if "HASSTMT" in params:
                        body = endpoint.hasstmt(params)
                        self._reply(200, body, "application/xml")
                        return
                    if "CONTEXTS" in params:
                        body = endpoint.contexts()
                        self._reply(200, body, "application/xml")
                        return
                    if "update" in params:
                        # SPARQL 1.1 Protocol §2.2: update is POST-only.
                        # A mutating GET would be cacheable/prefetchable
                        # and CSRF-able (reference: UpdateServlet only
                        # registers doPost).
                        if not allow_update:
                            self._reply(
                                405,
                                "SPARQL UPDATE requires POST",
                                "text/plain",
                            )
                            return
                        endpoint.engine.update(params["update"])
                        self._reply(200, "", "text/plain")
                        return
                    query = params.get("query")
                    if not query:
                        self._reply(
                            400, "missing query parameter", "text/plain"
                        )
                        return
                    body, ctype = endpoint.evaluate(query, accept)
                    self._reply(200, body, ctype)
                except Exception as e:  # noqa: BLE001 — protocol error path
                    self._reply(400, f"{type(e).__name__}: {e}", "text/plain")

            def do_GET(self):
                u = urllib.parse.urlparse(self.path)
                params = {
                    k: v[0]
                    for k, v in urllib.parse.parse_qs(u.query, keep_blank_values=True).items()
                }
                self._run(params, allow_update=False)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n).decode()
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype == "application/sparql-query":
                    params = {"query": raw}
                elif ctype == "application/sparql-update":
                    params = {"update": raw}
                else:
                    params = {
                        k: v[0]
                        for k, v in urllib.parse.parse_qs(raw, keep_blank_values=True).items()
                    }
                self._run(params)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # ----------------------------------------------------- REST probes
    @staticmethod
    def _spoc(params: dict) -> dict:
        from .rio.reader import parse_term

        out = {}
        for key, arg in (("s", "s"), ("p", "p"), ("o", "o"), ("c", "g")):
            if params.get(key):
                out[arg] = parse_term(params[key])
        return out

    def estcard(self, params: dict) -> str:
        """Fast range count of a (s,p,o,c) pattern — XML contract of the
        reference's ESTCARD servlet (rangeCount attribute)."""
        import time as _t

        t0 = _t.time()
        n = self.engine.store.count_pattern(**self._spoc(params))
        ms = int((_t.time() - t0) * 1000)
        return (
            '<?xml version="1.0"?>'
            f'<data rangeCount="{n}" milliseconds="{ms}"/>'
        )

    def hasstmt(self, params: dict) -> str:
        got = self.engine.store.has_statement(**self._spoc(params))
        return (
            '<?xml version="1.0"?>'
            f'<data result="{str(got).lower()}"/>'
        )

    def contexts(self) -> str:
        from xml.sax.saxutils import quoteattr

        items = "".join(
            f"<context uri={quoteattr(t['lex'])}/>"
            for t in self.engine.store.contexts()
        )
        return f'<?xml version="1.0"?><contexts>{items}</contexts>'

    # ------------------------------------------------------------ eval
    def evaluate(self, query: str, accept: str = "") -> tuple[str, str]:
        """Run one protocol request; returns (body, content_type)."""
        from .rio import writers as W
        from .sparql import ast as A
        from .sparql.parser import parse_query

        q = parse_query(query)
        fmt = _negotiate(accept)
        if isinstance(q, A.AskQuery):
            got = self.engine.ask(query)
            if fmt == "xml":
                return (
                    '<?xml version="1.0"?><sparql xmlns="http://www.w3.org/'
                    '2005/sparql-results#"><head/><boolean>'
                    f"{str(got).lower()}</boolean></sparql>",
                    CONTENT_TYPES["xml"],
                )
            return (
                json.dumps({"head": {}, "boolean": got}),
                CONTENT_TYPES["json"],
            )
        if isinstance(q, (A.ConstructQuery, A.DescribeQuery)):
            df = (
                self.engine.construct(query)
                if isinstance(q, A.ConstructQuery)
                else self.engine.describe(query)
            )
            # graph content negotiation (BigdataTurtleWriter /
            # ConnegUtil): text/turtle → abbreviated Turtle, otherwise
            # N-Triples
            wants_ttl = any(
                part.split(";")[0].strip().lower()
                in ("text/turtle", "application/x-turtle")
                for part in (accept or "").split(",")
            )
            if wants_ttl:
                return W.turtle_string(df), "text/turtle"
            lines = [r["value"] for r in W.ntriples_lines(df).toLocalIterator()]
            return "\n".join(lines) + ("\n" if lines else ""), "application/n-triples"
        res = self.engine.select(query)
        writer = {
            "json": W.results_json,
            "xml": W.results_xml,
            "csv": W.results_csv,
            "tsv": W.results_tsv,
        }[fmt]
        return writer(res), CONTENT_TYPES[fmt]

    # ------------------------------------------------------------ life
    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/sparql"

    def start(self) -> "SparqlEndpoint":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
