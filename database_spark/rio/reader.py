"""RDF serialization readers → term-struct triple DataFrames.

Reference: RIO loaders under ``bigdata-rdf/.../rio/`` (N-Triples parser
``BigdataNTriplesParser.java``, Turtle ``BigdataTurtleParser.java``,
TriG/N-Quads via Sesame; driver ``DataLoader.java:90``).  Here: a
Python tokenizer for the line-oriented formats plus a Turtle subset
(prefixes, ``a``, ``;``/``,`` lists, typed/lang literals, bnodes,
collections NOT supported).  Parsing happens driver-side for small
fixture files and distributes via ``spark.read.text`` +
``mapInPandas`` for bulk N-Triples — the scale path keeps the parse on
executors (one Arrow batch of lines in, one batch of term rows out).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from .. import terms as T
from ..terms import Term, statement_sid  # noqa: F401 — statement_sid re-exported

TRIPLE_SCHEMA = StructType(
    [
        StructField("st", T.TERM_TYPE, False),
        StructField("pt", T.TERM_TYPE, False),
        StructField("ot", T.TERM_TYPE, False),
        StructField("gt", T.TERM_TYPE, True),
    ]
)

def quads_to_df(spark: SparkSession, quads) -> DataFrame:
    """(Term, Term, Term, Term|None) iterable → TRIPLE_SCHEMA DataFrame
    through pandas + Arrow: a pure-JVM local relation, so downstream
    actions never pay the Python-RDD worker round-trip of a list-based
    createDataFrame."""
    import pandas as pd

    def d(t):
        return (
            None
            if t is None
            else {"kind": t.kind, "lex": t.lex, "dt": t.dt, "lang": t.lang}
        )

    rows = [(d(s), d(p), d(o), d(g)) for s, p, o, g in quads]
    if not rows:
        return spark.createDataFrame([], TRIPLE_SCHEMA)
    pdf = pd.DataFrame(rows, columns=["st", "pt", "ot", "gt"])
    return spark.createDataFrame(pdf, TRIPLE_SCHEMA)


_NT_TERM = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | _:(?P<bnode>\S+)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9-]+))?
    )""",
    re.VERBOSE,
)

_ESC = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\", "'": "'"}


def _unescape(s: str) -> str:
    def sub(m):
        c = m.group(1)
        if c.startswith("u"):
            return chr(int(c[1:5], 16))
        if c.startswith("U"):
            return chr(int(c[1:9], 16))
        return _ESC.get(c, c)

    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", sub, s)


def parse_nt_line(line: str):
    """One N-Triples/N-Quads statement → (Term, Term, Term, Term|None)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    terms = []
    pos = 0
    while len(terms) < 4:
        rest = line[pos:]
        if rest.lstrip().startswith("."):
            break
        m = _NT_TERM.match(line, pos)
        if not m:
            raise ValueError(f"bad N-Triples at {line[pos:pos+40]!r}")
        pos = m.end()
        if m.group("iri") is not None:
            terms.append(Term.iri(_unescape(m.group("iri"))))
        elif m.group("bnode") is not None:
            terms.append(Term.bnode(m.group("bnode")))
        else:
            terms.append(
                Term.literal(
                    _unescape(m.group("lit")), dt=m.group("dt"), lang=m.group("lang")
                )
            )
    if len(terms) < 3:
        raise ValueError(f"short statement: {line!r}")
    s, p, o = terms[0], terms[1], terms[2]
    g = terms[3] if len(terms) > 3 else None
    return (s, p, o, g)


def parse_term(text: str) -> Term:
    """One N-Triples-syntax term (``<iri>``, ``"lit"^^<dt>``, ``"lit"@lang``,
    ``_:b``) → Term; the REST protocol's s/p/o/c parameter syntax
    (reference: BigdataRDFServlet.decodeValue)."""
    m = _NT_TERM.match(text)
    if not m or m.end() != len(text.rstrip()):
        raise ValueError(f"bad term syntax: {text!r}")
    if m.group("iri") is not None:
        return Term.iri(_unescape(m.group("iri")))
    if m.group("bnode") is not None:
        return Term.bnode(m.group("bnode"))
    return Term.literal(
        _unescape(m.group("lit")), dt=m.group("dt"), lang=m.group("lang")
    )


def read_ntriples(spark: SparkSession, path: str, distributed: bool = False) -> DataFrame:
    """N-Triples/N-Quads file → triples DataFrame (term structs).

    distributed=True parses on executors via mapInPandas (bulk loads);
    default parses driver-side (fixture-sized files).
    """
    if not distributed:
        rows = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                q = parse_nt_line(line)
                if q:
                    rows.append(q)
        return quads_to_df(spark, rows)

    lines = spark.read.text(path)

    def parse_batch(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                q = parse_nt_line(line)
                if q:
                    s, p, o, g = q
                    rows.append(
                        {
                            "st": s.as_row(),
                            "pt": p.as_row(),
                            "ot": o.as_row(),
                            "gt": g.as_row() if g else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=["st", "pt", "ot", "gt"])

    return lines.mapInPandas(parse_batch, TRIPLE_SCHEMA)


# ------------------------------------------------------------------ turtle
_TTL_TOKEN = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<PREFIX>@prefix|@base|(?i:PREFIX)\b(?!:)|(?i:BASE)\b(?!:))
  | (?P<GRAPH>(?i:GRAPH)\b(?!:))
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<STRING_LONG>(?:'''(?:[^'\\]|\\.|'(?!''))*''')|(?:\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"))
  | (?P<STRING>'(?:[^'\\\n]|\\.)*'|"(?:[^"\\\n]|\\.)*")
  | (?P<BLANK>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<PNAME>(?:[A-Za-z][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_%](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?)?)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<BOOL>true\b|false\b)
  | (?P<A>a\b)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<RDFSTAR><<|>>)
  | (?P<NAME>[A-Za-z][A-Za-z0-9_.-]*)
  | (?P<OP>\^\^|[\[\](){};,.])
    """,
    re.VERBOSE,
)


class TurtleParser:
    """Minimal Turtle + TriG (covers the reference's .ttl/.trig test
    fixtures).  Emits quads; ``g`` is None in the default graph.
    Supports collections ``( … )``, blank-node property lists, graph
    blocks ``GRAPH <g> { … }`` / ``<g> { … }`` / ``{ … }``, and RDF*
    embedded triples ``<< s p o >>`` (mapped to a statement-identifier
    bnode per SURVEY §1.4 SID mapping)."""

    def __init__(self, text: str):
        self.toks = []
        i = 0
        while i < len(text):
            m = _TTL_TOKEN.match(text, i)
            if not m:
                raise ValueError(f"turtle lex error: {text[i:i+40]!r}")
            if m.lastgroup != "WS":
                self.toks.append((m.lastgroup, m.group(0)))
            i = m.end()
        self.toks.append(("EOF", ""))
        self.i = 0
        # pre-declared well-known namespaces: the reference's fixture
        # corpus uses rdf:/rdfs:/skos: in data files without declaring
        # them (its harness parses with defaults pre-registered)
        self.prefixes: dict[str, str] = dict(T.WELL_KNOWN_PREFIXES)
        self.base = ""
        self.quads: list = []
        self.graph: Term | None = None
        self._bn = 0

    @property
    def triples(self) -> list:
        return [(s, p, o) for s, p, o, _ in self.quads]

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def emit(self, s: Term, p: Term, o: Term):
        self.quads.append((s, p, o, self.graph))

    def parse(self) -> list:
        while self.peek()[0] != "EOF":
            k, v = self.peek()
            if k == "PREFIX":
                self.next()
                if v.lower().endswith("base"):
                    self.base = self.next()[1][1:-1]
                else:
                    k2, v2 = self.next()
                    if k2 == "NAME":
                        # '@prefix ns : <iri>' — whitespace before the
                        # colon (seen in the reference's fixtures)
                        colon = self.next()
                        if colon != ("PNAME", ":"):
                            raise ValueError(f"expected ':' after @prefix {v2!r}, got {colon!r}")
                        pname = v2 + ":"
                    else:
                        pname = v2
                    iri = self.next()[1][1:-1]
                    self.prefixes[pname[:-1]] = iri
                if self.peek() == ("OP", "."):
                    self.next()
                continue
            if k == "GRAPH":  # TriG: GRAPH <g> { ... }
                self.next()
                g = self.parse_node(subject=True)
                self.parse_graph_block(g)
                continue
            if (k, v) == ("OP", "{"):  # TriG: anonymous default-graph block
                self.parse_graph_block(None)
                continue
            self.parse_statement()
            if self.peek() == ("OP", "."):
                self.next()
        return self.quads

    def parse_graph_block(self, g: Term | None):
        tk = self.next()
        if tk != ("OP", "{"):
            raise ValueError(f"expected {{ got {tk!r}")
        prev, self.graph = self.graph, g
        while self.peek() != ("OP", "}"):
            if self.peek()[0] == "EOF":
                raise ValueError("unterminated graph block")
            self.parse_statement()
            if self.peek() == ("OP", "."):
                self.next()
        self.next()  # }
        self.graph = prev
        if self.peek() == ("OP", "."):
            self.next()

    def fresh_bnode(self) -> Term:
        self._bn += 1
        return Term.bnode(f"ttl{self._bn}")

    def parse_statement(self):
        s = self.parse_node(subject=True)
        if self.peek() == ("OP", "{"):  # TriG: <g> { ... }
            self.parse_graph_block(s)
            return
        # a bare blank-node property list / collection may stand alone
        if self.peek()[1] in (".", "}") or self.peek()[0] == "EOF":
            return
        self.parse_polist(s)

    def parse_polist(self, s: Term):
        while True:
            k, v = self.peek()
            if k == "A":
                self.next()
                p = Term.iri(T.RDF + "type")
            else:
                p = self.parse_node()
            while True:
                o = self.parse_node()
                self.emit(s, p, o)
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            if self.peek() == ("OP", ";"):
                self.next()
                if self.peek()[0] in ("OP", "EOF") and self.peek()[1] in (".", "]", ""):
                    return
                continue
            return

    def parse_node(self, subject: bool = False) -> Term:
        k, v = self.next()
        if k == "IRIREF":
            iri = _unescape(v[1:-1])
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri
            return Term.iri(iri)
        if k == "PNAME":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r}")
            return Term.iri(self.prefixes[pfx] + local)
        if k == "BLANK":
            return Term.bnode(v[2:])
        if k in ("STRING", "STRING_LONG"):
            lex = _unescape(v[3:-3] if k == "STRING_LONG" else v[1:-1])
            nk, nv = self.peek()
            if nk == "LANGTAG":
                self.next()
                return Term.literal(lex, lang=nv[1:])
            if (nk, nv) == ("OP", "^^"):
                self.next()
                dt = self.parse_node()
                return Term.literal(lex, dt=dt.lex)
            return Term.literal(lex)
        if k == "INTEGER":
            return Term.literal(v, T.XSD_INTEGER)
        if k == "DECIMAL":
            return Term.literal(v, T.XSD_DECIMAL)
        if k == "DOUBLE":
            return Term.literal(v, T.XSD_DOUBLE)
        if k == "BOOL":
            return Term.boolean(v == "true")
        if k == "A":
            return Term.iri(T.RDF + "type")
        if (k, v) == ("OP", "["):
            bn = self.fresh_bnode()
            if self.peek() != ("OP", "]"):
                self.parse_polist(bn)
            tk = self.next()
            if tk != ("OP", "]"):
                raise ValueError(f"expected ] got {tk!r}")
            return bn
        if (k, v) == ("OP", "("):  # collection → rdf:first/rest chain
            items = []
            while self.peek() != ("OP", ")"):
                if self.peek()[0] == "EOF":
                    raise ValueError("unterminated collection")
                items.append(self.parse_node())
            self.next()  # )
            nil = Term.iri(T.RDF + "nil")
            if not items:
                return nil
            first, rest = Term.iri(T.RDF + "first"), Term.iri(T.RDF + "rest")
            head = self.fresh_bnode()
            node = head
            for i, item in enumerate(items):
                self.emit(node, first, item)
                nxt = self.fresh_bnode() if i + 1 < len(items) else nil
                self.emit(node, rest, nxt)
                node = nxt
            return head
        if (k, v) == ("RDFSTAR", "<<"):
            # RDF* / SIDs: << s p o >> asserts the triple and yields its
            # statement identifier (reference: RDF/rdf/spo/SPO.java SIDs
            # mode, VTE.STATEMENT).  sid = deterministic bnode over n3.
            es = self.parse_node(subject=True)
            ep = self.parse_node()
            eo = self.parse_node()
            tk = self.next()
            if tk != ("RDFSTAR", ">>"):
                raise ValueError(f"expected >> got {tk!r}")
            self.emit(es, ep, eo)
            return statement_sid(es, ep, eo)
        raise ValueError(f"unexpected turtle token {k} {v!r}")




def _quads_df(spark: SparkSession, quads) -> DataFrame:
    return quads_to_df(spark, quads)


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return _quads_df(spark, TurtleParser(text).parse())


def read_trig(spark: SparkSession, path: str) -> DataFrame:
    """TriG = Turtle + graph blocks; the parser handles both."""
    return read_turtle(spark, path)


#: RDF document MIME type → parser family (InsertServlet/DeleteServlet
#: POST-with-body content negotiation; the reference resolves these via
#: the Sesame RDFParserRegistry)
RDF_BODY_TYPES = {
    "application/n-triples": "nt",
    "text/plain": "nt",  # legacy NT mime, as in the reference
    "application/n-quads": "nt",
    "text/x-nquads": "nt",
    "text/turtle": "ttl",
    "application/x-turtle": "ttl",
    "application/trig": "ttl",
    "application/rdf+xml": "rdfxml",
    "application/ld+json": "jsonld",
}


def parse_rdf_body(text: str, content_type: str) -> list:
    """RDF document body → driver-side quad list [(s,p,o,g|None)],
    dispatched on MIME type (the InsertServlet POST-with-body parse).
    Raises ValueError for non-RDF content types."""
    kind = RDF_BODY_TYPES.get((content_type or "").split(";")[0].strip().lower())
    if kind is None:
        raise ValueError(f"Content-Type not recognized as RDF: {content_type!r}")
    if kind == "nt":
        out = []
        for line in text.splitlines():
            q = parse_nt_line(line)
            if q:
                out.append(q)
        return out
    if kind == "ttl":
        return TurtleParser(text).parse()
    if kind == "rdfxml":
        from .rdfxml import parse_rdfxml

        return [(s, p, o, None) for (s, p, o) in parse_rdfxml(text)]
    from .jsonld import parse_jsonld

    return parse_jsonld(text)


def read_rdf(spark: SparkSession, path: str, distributed: bool = False) -> DataFrame:
    if path.endswith((".nt", ".nq")):
        return read_ntriples(spark, path, distributed)
    if path.endswith((".ttl", ".trig")):
        return read_turtle(spark, path)
    if path.endswith((".rdf", ".xml", ".owl")):
        from .rdfxml import read_rdfxml

        return read_rdfxml(spark, path)
    if path.endswith((".jsonld", ".json")):
        from .jsonld import read_jsonld

        return read_jsonld(spark, path)
    raise ValueError(f"unsupported RDF format: {path}")
