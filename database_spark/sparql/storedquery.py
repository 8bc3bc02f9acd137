"""Stored-query SERVICE — named server-side SPARQL procedures.

Reference: ``bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/service/
storedquery/StoredQueryService.java`` (SERVICE
``<bsq:NAME> {}`` executes a registered query against the same store;
exercised by ``TestStoredQueryService.java`` / ``stored-query-001``).

Spark design: the stored text parses to a SELECT AST and compiles as an
ordinary subselect INSIDE the calling query's plan — Catalyst sees one
combined plan, so outer BINDINGS/joins flow into it exactly like an
inline subquery (the reference achieves the same by running the stored
query with the incoming binding sets).
"""

from __future__ import annotations

STORED_QUERY_NS = "http://www.bigdata.com/rdf/stored-query#"

_STORED: dict[str, str] = {}


def register_stored_query(name: str, text: str) -> None:
    """Register under a bare name (``test_q``) or a full IRI."""
    iri = name if name.startswith("http") else STORED_QUERY_NS + name
    _STORED[iri] = text


def unregister_stored_query(name: str) -> None:
    iri = name if name.startswith("http") else STORED_QUERY_NS + name
    _STORED.pop(iri, None)


def make_stored_query_service() -> dict:
    def handler(compiler, sp, graph):
        from .compiler import SparqlCompileError
        from .parser import parse_query

        iri = sp.endpoint.term.lex
        text = _STORED.get(iri)
        if text is None:
            raise SparqlCompileError(f"no stored query registered at <{iri}>")
        q = parse_query(text)
        return compiler._subselect(q, graph)

    return {STORED_QUERY_NS: handler}
