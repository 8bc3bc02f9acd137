"""Remote Blueprints property-graph client over the SPARQL protocol.

Reference: ``bigdata-blueprints/src/main/java/com/bigdata/blueprints/
BigdataGraphClient.java`` — the Blueprints ``Graph`` that talks to a
NanoSparqlServer instead of an embedded journal: every read is a
SPARQL SELECT against the remote endpoint, every mutation a SPARQL
UPDATE, using the exact same ``BlueprintsValueFactory`` RDF mapping as
the embedded graph (``BigdataGraphFactory.connect`` returns this when
given a URL).

This client is deliberately Spark-free: it pairs with
:class:`database_spark.server.SparqlEndpoint` (or any SPARQL 1.1
Protocol endpoint serving the same mapping) and runs anywhere a plain
HTTP client runs.  It reuses the embedded veneer's :class:`Vertex` /
:class:`Edge` element classes — they delegate every operation to their
``graph`` object, so the same traversal/test matrix drives both the
embedded and the remote graph.

Mutation batching mirrors the reference client: one logical Blueprints
operation = ONE SPARQL UPDATE request (possibly multiple ``;``-chained
operations), which the engine applies as a single commit — so remote
``setProperty`` is retract+assert in one changeset, same as embedded.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
import uuid

from .blueprints import (
    BD_EDGE,
    BD_VERTEX,
    RDF_TYPE,
    RDFS_LABEL,
    BlueprintsValueFactory,
    Edge,
    Vertex,
)
from . import terms as T
from .terms import Term


def _value_term(factory: BlueprintsValueFactory, value) -> Term:
    return factory.to_literal(value)


def _json_term(b: dict) -> Term:
    """SPARQL-results-JSON binding → driver Term."""
    t = b["type"]
    if t == "uri":
        return Term.iri(b["value"])
    if t == "bnode":
        return Term.bnode(b["value"])
    if "xml:lang" in b:
        return Term.literal(b["value"], lang=b["xml:lang"])
    return Term.literal(b["value"], dt=b.get("datatype"))


class PropertyGraphClient:
    """Blueprints graph speaking SPARQL 1.1 Protocol to ``url``
    (BigdataGraphClient analog).  ``url`` is the sparql resource, e.g.
    ``http://host:port/sparql`` or a ``/namespace/<ns>/sparql``."""

    def __init__(self, url: str, factory: BlueprintsValueFactory | None = None):
        self.url = url
        self.factory = factory or BlueprintsValueFactory()

    # --------------------------------------------------------- protocol
    def _select(self, query: str) -> list:
        q = urllib.parse.urlencode({"query": query})
        req = urllib.request.Request(
            f"{self.url}?{q}",
            headers={"Accept": "application/sparql-results+json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())["results"]["bindings"]

    def _ask(self, query: str) -> bool:
        q = urllib.parse.urlencode({"query": query})
        req = urllib.request.Request(
            f"{self.url}?{q}",
            headers={"Accept": "application/sparql-results+json"},
        )
        with urllib.request.urlopen(req) as r:
            return bool(json.loads(r.read())["boolean"])

    def _update(self, text: str) -> None:
        data = urllib.parse.urlencode({"update": text}).encode()
        req = urllib.request.Request(self.url, data=data, method="POST")
        urllib.request.urlopen(req).read()

    # ----------------------------------------------------------- vertex
    def add_vertex(self, vid=None) -> Vertex:
        if vid is None:
            vid = str(uuid.uuid4())
        uri = self.factory.to_vertex_uri(vid)
        self._update(
            f"INSERT DATA {{ <{uri}> <{RDF_TYPE}> <{BD_VERTEX}> }}"
        )
        return Vertex(self, vid, uri)

    def get_vertex(self, vid) -> Vertex | None:
        uri = self.factory.to_vertex_uri(vid)
        if self._ask(f"ASK {{ <{uri}> <{RDF_TYPE}> <{BD_VERTEX}> }}"):
            return Vertex(self, vid, uri)
        return None

    def remove_vertex(self, vertex: Vertex) -> None:
        """Vertex + properties + incident edges and their state, in ONE
        update request (the reference client sends one remote update):
        edge state goes first, while the relationship statements that
        identify the incident edges still exist."""
        u = vertex.uri
        ens = self.factory.edge_namespace
        self._update(
            f"""
            DELETE {{ ?e ?ep ?eo }}
            WHERE {{
              {{ <{u}> ?e ?x }} UNION {{ ?x ?e <{u}> }}
              FILTER(STRSTARTS(STR(?e), "{ens}"))
              ?e ?ep ?eo .
            }} ;
            DELETE WHERE {{ <{u}> ?p ?o }} ;
            DELETE WHERE {{ ?s ?p2 <{u}> }}
            """
        )

    def get_vertices(self, key: str | None = None, value=None):
        f = self.factory
        if key is None:
            rows = self._select(
                f"SELECT ?v WHERE {{ ?v <{RDF_TYPE}> <{BD_VERTEX}> }}"
            )
        else:
            lit = _value_term(f, value).n3()
            rows = self._select(
                f"""SELECT ?v WHERE {{
                  ?v <{f.to_property_uri(key)}> {lit} .
                  FILTER(STRSTARTS(STR(?v), "{f.vertex_namespace}"))
                }}"""
            )
        for r in rows:
            uri = r["v"]["value"]
            yield Vertex(self, f.from_uri(uri), uri)

    # ------------------------------------------------------------- edge
    def add_edge(self, eid, from_v: Vertex, to_v: Vertex, label: str) -> Edge:
        if label is None:
            raise ValueError("edge label is required")
        if eid is None:
            eid = str(uuid.uuid4())
        uri = self.factory.to_edge_uri(eid)
        lbl = Term.literal(label).n3()
        self._update(
            f"""INSERT DATA {{
              <{from_v.uri}> <{uri}> <{to_v.uri}> .
              <{uri}> <{RDF_TYPE}> <{BD_EDGE}> .
              <{uri}> <{RDFS_LABEL}> {lbl} .
            }}"""
        )
        return Edge(self, eid, uri, from_v.uri, to_v.uri, label)

    def get_edge(self, eid) -> Edge | None:
        uri = self.factory.to_edge_uri(eid)
        rows = self._select(
            f"""SELECT ?s ?o ?lbl WHERE {{
              ?s <{uri}> ?o .
              OPTIONAL {{ <{uri}> <{RDFS_LABEL}> ?lbl }}
            }} LIMIT 1"""
        )
        if not rows:
            return None
        r = rows[0]
        lbl = r["lbl"]["value"] if "lbl" in r else None
        return Edge(self, eid, uri, r["s"]["value"], r["o"]["value"], lbl)

    def remove_edge(self, edge: Edge) -> None:
        u = edge.uri
        self._update(
            f"DELETE WHERE {{ ?s <{u}> ?o }} ; DELETE WHERE {{ <{u}> ?p ?o }}"
        )

    def get_edges(self, key: str | None = None, value=None):
        f = self.factory
        extra = ""
        if key is not None:
            lit = _value_term(f, value).n3()
            extra = f"?e <{f.to_property_uri(key)}> {lit} ."
        rows = self._select(
            f"""SELECT ?e ?out ?in ?lbl WHERE {{
              ?out ?e ?in .
              FILTER(STRSTARTS(STR(?e), "{f.edge_namespace}"))
              {extra}
              OPTIONAL {{ ?e <{RDFS_LABEL}> ?lbl }}
            }}"""
        )
        for r in rows:
            uri = r["e"]["value"]
            yield Edge(
                self,
                f.from_uri(uri),
                uri,
                r["out"]["value"],
                r["in"]["value"],
                r["lbl"]["value"] if "lbl" in r else None,
            )

    def _incident_edges(self, v: Vertex, direction: str, label: str | None) -> list:
        f = self.factory
        if direction == "out":
            pat = f"<{v.uri}> ?e ?in . BIND(<{v.uri}> AS ?out)"
        elif direction == "in":
            pat = f"?out ?e <{v.uri}> . BIND(<{v.uri}> AS ?in)"
        else:
            pat = (
                f"{{ <{v.uri}> ?e ?in . BIND(<{v.uri}> AS ?out) }} UNION "
                f"{{ ?out ?e <{v.uri}> . BIND(<{v.uri}> AS ?in) }}"
            )
        rows = self._select(
            f"""SELECT ?e ?out ?in ?lbl WHERE {{
              {pat}
              FILTER(STRSTARTS(STR(?e), "{f.edge_namespace}"))
              OPTIONAL {{ ?e <{RDFS_LABEL}> ?lbl }}
            }}"""
        )
        out = []
        for r in rows:
            lbl = r["lbl"]["value"] if "lbl" in r else None
            if label is not None and lbl != label:
                continue
            uri = r["e"]["value"]
            out.append(
                Edge(self, f.from_uri(uri), uri, r["out"]["value"], r["in"]["value"], lbl)
            )
        return out

    # ------------------------------------------------------- properties
    def get_property(self, uri: str, prop_uri: str):
        rows = self._select(
            f"SELECT ?o WHERE {{ <{uri}> <{prop_uri}> ?o }}"
        )
        f = self.factory
        vals = []
        for r in rows:
            t = _json_term(r["o"])
            vals.append(f.from_literal(t.kind, t.lex, t.dt))
        if not vals:
            return None
        return vals[0] if len(vals) == 1 else vals

    def set_property(self, uri: str, prop_uri: str, value) -> None:
        lit = _value_term(self.factory, value).n3()
        # one request = one engine commit (retract+assert atomically,
        # the BigdataGraphClient single-update shape)
        self._update(
            f"DELETE WHERE {{ <{uri}> <{prop_uri}> ?o }} ; "
            f"INSERT DATA {{ <{uri}> <{prop_uri}> {lit} }}"
        )

    def remove_property(self, uri: str, prop_uri: str):
        old = self.get_property(uri, prop_uri)
        self._update(f"DELETE WHERE {{ <{uri}> <{prop_uri}> ?o }}")
        return old

    def get_property_keys(self, uri: str) -> set:
        f = self.factory
        rows = self._select(
            f"""SELECT ?p WHERE {{
              <{uri}> ?p ?o .
              FILTER(STRSTARTS(STR(?p), "{f.graph_namespace}"))
              FILTER(!STRSTARTS(STR(?p), "{f.vertex_namespace}"))
              FILTER(!STRSTARTS(STR(?p), "{f.edge_namespace}"))
            }}"""
        )
        return {f.from_uri(r["p"]["value"]) for r in rows}

    # ---------------------------------------------------------- criteria
    def query(self) -> "GraphQueryClient":
        return GraphQueryClient(self)


class GraphQueryClient:
    """Criteria query against the remote graph (the client half of
    ``GraphQuery``; reference ``BigdataGraphQuery``).  Criteria compile
    to FILTER (NOT) EXISTS groups so multi-valued properties cannot
    duplicate elements, mirroring the embedded semi/anti joins."""

    def __init__(self, graph: PropertyGraphClient):
        self.graph = graph
        self._criteria: list = []
        self._limit: int | None = None
        self._n = 0

    def has(self, key: str, value=None, predicate: str = "eq") -> "GraphQueryClient":
        self._criteria.append((key, value, predicate, False))
        return self

    def has_not(self, key: str, value=None) -> "GraphQueryClient":
        self._criteria.append((key, value, "eq", True))
        return self

    def interval(self, key: str, start, end) -> "GraphQueryClient":
        return self.has(key, start, "gte").has(key, end, "lt")

    def limit(self, n: int) -> "GraphQueryClient":
        self._limit = n
        return self

    _OPS = {"eq": "=", "neq": "!=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<="}

    def _clauses(self, subject: str) -> str:
        g = self.graph
        parts = []
        for i, (key, value, predicate, negated) in enumerate(self._criteria):
            prop = g.factory.to_property_uri(key)
            inner = f"{subject} <{prop}> ?qv{i} ."
            if value is not None:
                op = self._OPS[predicate]
                if isinstance(value, bool):
                    cond = f'STR(?qv{i}) {op} "{"true" if value else "false"}"'
                elif isinstance(value, (int, float)):
                    # numeric compare over the lexical form — identical
                    # to the embedded try_cast("double") semantics
                    cond = (
                        f"<http://www.w3.org/2001/XMLSchema#double>"
                        f"(STR(?qv{i})) {op} {float(value)!r}"
                    )
                else:
                    cond = f'STR(?qv{i}) {op} {Term.literal(str(value)).n3()}'
                inner += f" FILTER({cond})"
            kw = "NOT EXISTS" if negated else "EXISTS"
            parts.append(f"FILTER {kw} {{ {inner} }}")
        return "\n".join(parts)

    def vertices(self) -> list:
        g = self.graph
        f = g.factory
        lim = f" LIMIT {self._limit}" if self._limit is not None else ""
        rows = g._select(
            f"""SELECT ?v WHERE {{
              ?v <{RDF_TYPE}> <{BD_VERTEX}> .
              {self._clauses("?v")}
            }}{lim}"""
        )
        return [Vertex(g, f.from_uri(r["v"]["value"]), r["v"]["value"]) for r in rows]

    def edges(self) -> list:
        g = self.graph
        f = g.factory
        lim = f" LIMIT {self._limit}" if self._limit is not None else ""
        rows = g._select(
            f"""SELECT ?e ?out ?in ?lbl WHERE {{
              {{ SELECT DISTINCT ?e WHERE {{
                   ?a ?e ?b .
                   FILTER(STRSTARTS(STR(?e), "{f.edge_namespace}"))
                   {self._clauses("?e")}
              }}{lim} }}
              ?out ?e ?in .
              OPTIONAL {{ ?e <{RDFS_LABEL}> ?lbl }}
            }}"""
        )
        return [
            Edge(
                g,
                f.from_uri(r["e"]["value"]),
                r["e"]["value"],
                r["out"]["value"],
                r["in"]["value"],
                r["lbl"]["value"] if "lbl" in r else None,
            )
            for r in rows
        ]
