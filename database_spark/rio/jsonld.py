"""JSON-LD reader → term-struct quad DataFrame.

Reference consumes JSON-LD through Sesame RIO (format registry per
``pom.xml``).  This is an independent subset implementation covering
the common shapes (the full JSON-LD 1.1 expansion algorithm is out of
scope):

- ``@context``: term→IRI strings, ``{"@id": …, "@type": …}`` term
  definitions, ``@vocab``, ``@base``, prefix expansion (``ex:name``)
- node objects: ``@id``, ``@type`` (string or list), nested nodes
- value objects ``{"@value", "@type", "@language"}``, bare JSON
  scalars (str → xsd:string, int → xsd:integer, float → xsd:double,
  bool → xsd:boolean), ``{"@id": …}`` references
- arrays (multi-valued), ``@list`` → rdf:first/rest chains
- top-level ``@graph`` arrays and named graphs (node with @id+@graph)

Driver-side parse (JSON documents don't line-split); convert to
N-Triples for distributed bulk loads.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .. import terms as T
from ..terms import Term
from .reader import TRIPLE_SCHEMA

_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@graph", "@context"}


class _JsonLdParser:
    def __init__(self):
        self.quads: list = []
        self._bn = 0

    def fresh_bnode(self) -> Term:
        self._bn += 1
        return Term.bnode(f"jl{self._bn}")

    def emit(self, s, p, o, g):
        self.quads.append((s, p, o, g))

    # ---------------------------------------------------------- context
    def _expand(self, term: str, ctx: dict, vocab: bool = False) -> str | None:
        """Expand a term/compact-IRI to a full IRI (or None if unmappable)."""
        if term.startswith("@"):
            return term
        if term in ctx:
            defn = ctx[term]
            if defn is None:
                return None
            if isinstance(defn, str):
                return self._expand(defn, {k: v for k, v in ctx.items() if k != term}, vocab)
            if isinstance(defn, dict) and "@id" in defn:
                return self._expand(defn["@id"], {k: v for k, v in ctx.items() if k != term}, vocab)
        if ":" in term:
            pfx, _, local = term.partition(":")
            if pfx in ctx and isinstance(ctx[pfx], str):
                return ctx[pfx] + local
            if local.startswith("//") or pfx in ("urn", "http", "https", "file", "tag", "mailto"):
                return term
            return term
        if vocab and "@vocab" in ctx:
            return ctx["@vocab"] + term
        if not vocab and "@base" in ctx:
            from urllib.parse import urljoin

            return urljoin(ctx["@base"], term)
        return term if not vocab else None

    def _term_def(self, key: str, ctx: dict) -> dict:
        d = ctx.get(key)
        return d if isinstance(d, dict) else {}

    # ------------------------------------------------------------ nodes
    def parse_node(self, obj: dict, ctx: dict, g: Term | None) -> Term:
        if "@context" in obj:
            ctx = {**ctx, **(obj["@context"] or {})}
        if "@id" in obj:
            ref = obj["@id"]
            subj = Term.bnode(ref[2:]) if ref.startswith("_:") else Term.iri(
                self._expand(ref, ctx) or ref
            )
        else:
            subj = self.fresh_bnode()
        types = obj.get("@type", [])
        for t in types if isinstance(types, list) else [types]:
            self.emit(subj, Term.iri(T.RDF + "type"), Term.iri(self._expand(t, ctx, vocab=True) or t), g)
        if "@graph" in obj:
            gname = subj if "@id" in obj else g
            for node in obj["@graph"]:
                self.parse_node(node, ctx, gname)
        for key, val in obj.items():
            if key in _KEYWORDS:
                continue
            pred_iri = self._expand(key, ctx, vocab=True)
            if pred_iri is None or pred_iri.startswith("@"):
                continue
            pred = Term.iri(pred_iri)
            tdef = self._term_def(key, ctx)
            for v in val if isinstance(val, list) else [val]:
                o = self.parse_value(v, ctx, g, tdef)
                if o is not None:
                    self.emit(subj, pred, o, g)
        return subj

    def parse_value(self, v, ctx: dict, g: Term | None, tdef: dict) -> Term | None:
        if isinstance(v, dict):
            if "@list" in v:
                items = [self.parse_value(x, ctx, g, tdef) for x in v["@list"]]
                return self._collection([x for x in items if x is not None], g)
            if "@value" in v:
                lex = v["@value"]
                if isinstance(lex, bool):
                    return Term.boolean(lex)
                dt = v.get("@type")
                lang = v.get("@language")
                if isinstance(lex, int) and not dt:
                    return Term.integer(lex)
                if isinstance(lex, float) and not dt:
                    return Term.double(lex)
                return Term.literal(
                    str(lex), dt=self._expand(dt, ctx, vocab=True) if dt else None, lang=lang
                )
            if set(v) == {"@id"} or (tdef.get("@type") == "@id" and "@id" in v):
                ref = v["@id"]
                return Term.bnode(ref[2:]) if ref.startswith("_:") else Term.iri(
                    self._expand(ref, ctx) or ref
                )
            return self.parse_node(v, ctx, g)
        if isinstance(v, bool):
            return Term.boolean(v)
        if isinstance(v, int):
            return Term.integer(v)
        if isinstance(v, float):
            return Term.double(v)
        if isinstance(v, str):
            if tdef.get("@type") == "@id":
                return Term.iri(self._expand(v, ctx) or v)
            dt = tdef.get("@type")
            lang = tdef.get("@language")
            return Term.literal(
                v, dt=self._expand(dt, ctx, vocab=True) if dt else None, lang=lang
            )
        return None

    def _collection(self, items: list[Term], g: Term | None) -> Term:
        nil = Term.iri(T.RDF + "nil")
        if not items:
            return nil
        first, rest = Term.iri(T.RDF + "first"), Term.iri(T.RDF + "rest")
        head = self.fresh_bnode()
        node = head
        for i, item in enumerate(items):
            self.emit(node, first, item, g)
            nxt = self.fresh_bnode() if i + 1 < len(items) else nil
            self.emit(node, rest, nxt, g)
            node = nxt
        return head


def parse_jsonld(text: str) -> list:
    doc = json.loads(text)
    parser = _JsonLdParser()
    ctx: dict = {}
    if isinstance(doc, dict):
        ctx = doc.get("@context") or {}
        if "@graph" in doc and "@id" not in doc:
            for node in doc["@graph"]:
                parser.parse_node(node, ctx, None)
        else:
            parser.parse_node(doc, ctx, None)
    elif isinstance(doc, list):
        for node in doc:
            parser.parse_node(node, ctx, None)
    return parser.quads


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    from .reader import quads_to_df

    return quads_to_df(spark, parse_jsonld(text))
