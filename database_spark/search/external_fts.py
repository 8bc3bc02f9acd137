"""External full-text SERVICE (Solr-style) — ``fts:`` magic vocabulary.

Reference: ``bigdata-core/bigdata-rdf/src/java/com/bigdata/service/fts/
FTS.java`` (vocabulary + defaults), ``FulltextSearchException.java``
(error contract), ``FulltextSearchServiceFactory.java`` /
``impl/SolrFulltextSearchImpl.java`` (request assembly + response
binding), exercised by ``TestFulltextSearch.java`` over the ``fts-*``
fixtures.

Spark design: the search call is a DRIVER-side HTTP request (the remote
index does the heavy lifting, like the reference's vectored service
call); the response binds into the query as a pure-JVM local relation
(`terms_df`), so the join with surrounding patterns is an ordinary
Catalyst join — broadcastable when the hit list is small, shuffleable
otherwise.  The HTTP layer is injectable (`set_transport`) exactly like
``federation.py``'s, so conformance fixtures run hermetically.
"""

from __future__ import annotations

from pyspark.sql.functions import col as F_col

from .. import terms as T
from ..sparql import ast as A

FTS_NS = "http://www.bigdata.com/rdf/fts#"

# error contract (FulltextSearchException.java:39-51) — the TCK's
# reject fixtures match on these message suffixes
NO_QUERY_SPECIFIED = "Search string not specified or empty"
NO_ENDPOINT_SPECIFIED = "Endpoint not specified or empty"
SERVICE_VARIABLE_UNBOUND = "Service magic variable unbound at runtime"
TYPE_CAST_EXCEPTION = "Casting of result to URI failed"

# defaults (FTS.java Options)
DEFAULT_SEARCH_FIELD = "id"
DEFAULT_SEARCH_RESULT_TYPE = "LITERAL"
DEFAULT_TIMEOUT_MS = 2**31 - 1

#: injectable transport: fn(endpoint, query, params, timeout_ms,
#: search_field) -> iterable of {field: value} docs.  None = real HTTP.
_TRANSPORT = None


def set_transport(fn) -> None:
    """Install a transport (tests / air-gapped deployments); None
    restores the real Solr HTTP client."""
    global _TRANSPORT
    _TRANSPORT = fn


def _http_transport(endpoint, query, params, timeout_ms, search_field):
    """Real Solr select call (SolrFulltextSearchImpl.java request
    shape): GET endpoint?q=...&df=...&wt=json [+ params verbatim]."""
    import json
    import urllib.parse
    import urllib.request

    q = {"q": query, "wt": "json"}
    if search_field:
        q["df"] = search_field
    url = endpoint + ("&" if "?" in endpoint else "?") + urllib.parse.urlencode(q)
    if params:
        url += "&" + params
    with urllib.request.urlopen(
        url, timeout=max(0.001, (timeout_ms or DEFAULT_TIMEOUT_MS) / 1000.0)
    ) as r:
        doc = json.loads(r.read().decode("utf-8"))
    return doc.get("response", {}).get("docs", [])


class FulltextSearchException(RuntimeError):
    pass


class _RunLastGatedInputs:
    """`input_params` view for the as-bound machinery: search-string
    injection from prior bindings is only legal when the query carries
    hint:runLast (the reference executes SERVICE calls first otherwise,
    so an unbound magic variable is a hard error —
    fts-variableInjectionFailing vs fts-multiRequest)."""

    _KEYS = frozenset({"search"})

    def __contains__(self, k) -> bool:
        from ..sparql.functions import QUERY_HINTS

        if QUERY_HINTS.get().get("runLast", "").lower() != "true":
            return False
        return k in self._KEYS

    def __iter__(self):
        return iter(self._KEYS)

    def __bool__(self) -> bool:
        return True


def make_fts_service() -> dict:
    """SERVICE <fts:search> handler; also reachable through bare magic
    predicates via the compiler's ASTSearchOptimizer-style lifting."""

    def handler(compiler, sp: A.ServicePattern, graph):
        from ..sparql.compiler import Sol

        cfg: dict[str, object] = {}
        subj = None
        out_vars: dict[str, str] = {}  # score/snippet -> var name
        for el in sp.group.elements:
            if not (
                isinstance(el, A.TriplePattern)
                and isinstance(el.p, A.Const)
                and el.p.term.lex.startswith(FTS_NS)
            ):
                continue
            key = el.p.term.lex[len(FTS_NS):]
            if key in ("score", "snippet"):
                if isinstance(el.o, A.Var):
                    out_vars[key] = el.o.name
                continue
            cfg[key] = el.o
            subj = el.s

        def lex(key, default=None):
            v = cfg.get(key)
            if v is None:
                return default
            if isinstance(v, A.Var):
                raise FulltextSearchException(SERVICE_VARIABLE_UNBOUND)
            return v.term.lex

        search = cfg.get("search")
        if search is None:
            raise FulltextSearchException(NO_QUERY_SPECIFIED)
        if isinstance(search, A.Var):
            # only reached when as-bound injection was not allowed or
            # produced no value — the reference's runtime unbound error
            raise FulltextSearchException(SERVICE_VARIABLE_UNBOUND)
        query = search.term.lex
        if not query.strip():
            raise FulltextSearchException(NO_QUERY_SPECIFIED)
        endpoint = lex("endpoint")
        if not endpoint or not endpoint.strip():
            raise FulltextSearchException(NO_ENDPOINT_SPECIFIED)
        params = lex("params", "")
        search_field = lex("searchField", DEFAULT_SEARCH_FIELD)
        score_field = lex("scoreField")
        snippet_field = lex("snippetField")
        result_type = (
            lex("searchResultType", DEFAULT_SEARCH_RESULT_TYPE) or ""
        ).upper()
        try:
            timeout_ms = int(lex("timeout", str(DEFAULT_TIMEOUT_MS)))
        except ValueError:
            timeout_ms = DEFAULT_TIMEOUT_MS

        transport = _TRANSPORT or _http_transport
        docs = transport(endpoint, query, params, timeout_ms, search_field)

        def res_term(value) -> T.Term:
            s = str(value)
            if result_type == "URI":
                # very light URI well-formedness check (absolute IRI);
                # the reference raises on unparseable URIs
                if ":" not in s or " " in s:
                    raise FulltextSearchException(TYPE_CAST_EXCEPTION)
                return T.Term.iri(s)
            return T.Term.literal(s)

        rows = []
        for doc in docs:
            val = doc.get(search_field)
            if val is None:
                continue
            row = [res_term(val)]
            if "score" in out_vars:
                sv = doc.get(score_field) if score_field else None
                row.append(
                    None
                    if sv is None
                    else T.Term.literal(repr(float(sv)), dt=T.XSD_DOUBLE)
                )
            if "snippet" in out_vars:
                nv = doc.get(snippet_field) if snippet_field else None
                row.append(None if nv is None else T.Term.literal(str(nv)))
            rows.append(tuple(row))

        names = []
        vars_: set[str] = set()
        if isinstance(subj, A.Var):
            names.append(subj.name)
            vars_.add(subj.name)
        for key in ("score", "snippet"):
            if key in out_vars:
                names.append(out_vars[key])
                vars_.add(out_vars[key])
        if not isinstance(subj, A.Var):
            raise FulltextSearchException(
                "fts: subject must be a variable"
            )
        df = T.terms_df(compiler.spark, rows, names)
        sel = []
        for n in names:
            sel.append(F_col(n))
            sel.append(T.term_id(F_col(n)).alias(n + "__id"))
        return Sol(df.select(*sel), vars_, set())

    handler.input_params = _RunLastGatedInputs()
    return {FTS_NS: handler}
