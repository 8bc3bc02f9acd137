"""RDF/XML reader → term-struct triple DataFrame.

Reference parses RDF/XML via Sesame's ``RDFXMLParser`` (wired in
``bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/rio/``, formats per
``pom.xml`` Sesame 2.7.12).  This is an independent implementation of
the RDF/XML 1.1 striped syntax over ``xml.etree.ElementTree``:

- node elements: ``rdf:Description`` or typed nodes (QName → rdf:type)
- ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` / anonymous bnodes
- property elements with ``rdf:resource`` / ``rdf:nodeID`` /
  ``rdf:datatype`` / text content / nested node elements
- ``rdf:parseType`` Resource | Literal | Collection
- ``rdf:li`` → ``rdf:_1`` … counters, property attributes, ``xml:lang``
  and ``xml:base`` inheritance, ``rdf:ID`` statement reification

Parsing is driver-side (RDF/XML is a document format — it cannot be
split by newline); bulk loads at scale should convert to N-Triples
first (``rio.writers.write_ntriples``) and use the distributed path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from .. import terms as T
from ..terms import Term
from .reader import TRIPLE_SCHEMA

RDF_NS = T.RDF
_RDF = "{" + RDF_NS + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"

# rdf:* attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    _RDF + a
    for a in ("about", "ID", "nodeID", "resource", "datatype", "parseType", "RDF")
}

# core syntax element names that are not node elements
_NOT_NODE = {_RDF + n for n in ("RDF", "Description", "li")}


class _RdfXmlParser:
    def __init__(self):
        self.triples: list[tuple[Term, Term, Term]] = []
        self._bn = 0

    def fresh_bnode(self) -> Term:
        self._bn += 1
        return Term.bnode(f"rx{self._bn}")

    def emit(self, s: Term, p: Term, o: Term):
        self.triples.append((s, p, o))

    @staticmethod
    def _qname_iri(tag: str) -> str:
        # ElementTree gives "{ns}local"
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def parse_root(self, root: ET.Element, base: str):
        base = root.get(_XML_BASE, base)
        if root.tag == _RDF + "RDF":
            for child in root:
                self.parse_node_element(child, base, None)
        else:
            self.parse_node_element(root, base, None)

    def _resolve(self, base: str, ref: str) -> str:
        if not base:
            return ref
        return urljoin(base, ref)

    def parse_node_element(self, el: ET.Element, base: str, lang: str | None) -> Term:
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        about = el.get(_RDF + "about")
        rid = el.get(_RDF + "ID")
        node_id = el.get(_RDF + "nodeID")
        if about is not None:
            subj = Term.iri(self._resolve(base, about))
        elif rid is not None:
            subj = Term.iri(self._resolve(base, "#" + rid))
        elif node_id is not None:
            subj = Term.bnode(node_id)
        else:
            subj = self.fresh_bnode()
        if el.tag != _RDF + "Description":
            self.emit(subj, Term.iri(RDF_NS + "type"), Term.iri(self._qname_iri(el.tag)))
        # property attributes → literal triples (rdf:type special-cased)
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr in (_XML_LANG, _XML_BASE):
                continue
            if attr == _RDF + "type":
                self.emit(subj, Term.iri(RDF_NS + "type"), Term.iri(self._resolve(base, val)))
            elif attr.startswith("{"):
                self.emit(subj, Term.iri(self._qname_iri(attr)), Term.literal(val, lang=lang))
        li_counter = [0]
        for prop in el:
            self.parse_property_element(subj, prop, base, lang, li_counter)
        return subj

    def parse_property_element(
        self, subj: Term, el: ET.Element, base: str, lang: str | None, li_counter: list
    ):
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        if el.tag == _RDF + "li":
            li_counter[0] += 1
            pred = Term.iri(RDF_NS + f"_{li_counter[0]}")
        else:
            pred = Term.iri(self._qname_iri(el.tag))
        parse_type = el.get(_RDF + "parseType")
        resource = el.get(_RDF + "resource")
        node_id = el.get(_RDF + "nodeID")
        datatype = el.get(_RDF + "datatype")
        reify_id = el.get(_RDF + "ID")

        obj: Term
        if parse_type == "Resource":
            obj = self.fresh_bnode()
            inner_li = [0]
            for child in el:
                self.parse_property_element(obj, child, base, lang, inner_li)
        elif parse_type == "Literal":
            xml = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el
            )
            obj = Term.literal(xml, dt=RDF_NS + "XMLLiteral")
        elif parse_type == "Collection":
            items = [self.parse_node_element(c, base, lang) for c in el]
            obj = self._collection(items)
        elif resource is not None:
            obj = Term.iri(self._resolve(base, resource))
        elif node_id is not None:
            obj = Term.bnode(node_id)
        elif len(el) > 0:
            children = list(el)
            if len(children) != 1:
                raise ValueError(f"property element {el.tag} has {len(children)} children")
            obj = self.parse_node_element(children[0], base, lang)
        else:
            # literal: datatype / lang / plain; empty + property attrs → bnode
            prop_attrs = {
                a: v
                for a, v in el.attrib.items()
                if a not in _SYNTAX_ATTRS and a not in (_XML_LANG, _XML_BASE)
            }
            if prop_attrs and not (el.text or "").strip():
                obj = self.fresh_bnode()
                for a, v in prop_attrs.items():
                    self.emit(obj, Term.iri(self._qname_iri(a)), Term.literal(v, lang=lang))
            elif datatype is not None:
                obj = Term.literal(el.text or "", dt=datatype)
            else:
                obj = Term.literal(el.text or "", lang=lang)
        self.emit(subj, pred, obj)
        if reify_id is not None:
            st = Term.iri(self._resolve(base, "#" + reify_id))
            self.emit(st, Term.iri(RDF_NS + "type"), Term.iri(RDF_NS + "Statement"))
            self.emit(st, Term.iri(RDF_NS + "subject"), subj)
            self.emit(st, Term.iri(RDF_NS + "predicate"), pred)
            self.emit(st, Term.iri(RDF_NS + "object"), obj)

    def _collection(self, items: list[Term]) -> Term:
        nil = Term.iri(RDF_NS + "nil")
        if not items:
            return nil
        first, rest = Term.iri(RDF_NS + "first"), Term.iri(RDF_NS + "rest")
        head = self.fresh_bnode()
        node = head
        for i, item in enumerate(items):
            self.emit(node, first, item)
            nxt = self.fresh_bnode() if i + 1 < len(items) else nil
            self.emit(node, rest, nxt)
            node = nxt
        return head


def parse_rdfxml(text: str, base: str = "") -> list[tuple[Term, Term, Term]]:
    parser = _RdfXmlParser()
    parser.parse_root(ET.fromstring(text), base)
    return parser.triples


def read_rdfxml(spark: SparkSession, path: str, base: str = "") -> DataFrame:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    from .reader import quads_to_df

    return quads_to_df(
        spark, [(s, p, o, None) for s, p, o in parse_rdfxml(text, base)]
    )
