"""SPARQL 1.1 parser — tokenizer + recursive descent.

Reference: JavaCC grammar ``sparql-grammar/.../sparql.jjt`` +
``BigdataExprBuilder.java`` (SAILS/sparql).  This is an independent
hand-written parser for the SPARQL 1.1 Query + Update surface the
engine supports: SELECT/ASK/CONSTRUCT/DESCRIBE, group graph patterns
(BGP, FILTER, OPTIONAL, UNION, MINUS, GRAPH, SERVICE, BIND, VALUES,
sub-SELECT), property paths, expressions with all §17 builtins,
aggregates, solution modifiers, and the UPDATE verbs.
"""

from __future__ import annotations

import re

from ..terms import RDF, WELL_KNOWN_PREFIXES, XSD, Term
from . import ast as A


class SparqlSyntaxError(Exception):
    pass


# ------------------------------------------------------------------ tokens
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
  | (?P<STRING2>"(?:[^"\\\n]|\\.)*")
  | (?P<BLANK>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<VAR>[?$][A-Za-z0-9_]+)
  | (?P<PNAME>[A-Za-z][A-Za-z0-9_.-]*)?:(?P<PLOCAL>[A-Za-z0-9_]
        (?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<NAMEDSET>%[A-Za-z_][A-Za-z0-9_]*)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<OP>\^\^|\|\||&&|!=|<=|>=|[=<>!+\-*/|^?(){}\[\].,;])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "SELECT", "DISTINCT", "REDUCED", "WHERE", "FILTER", "OPTIONAL", "UNION",
    "MINUS", "GRAPH", "SERVICE", "SILENT", "BIND", "VALUES", "UNDEF", "AS",
    "GROUP", "BY", "HAVING", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET",
    "ASK", "CONSTRUCT", "DESCRIBE", "FROM", "NAMED", "PREFIX", "BASE",
    "EXISTS", "NOT", "IN", "A", "TRUE", "FALSE",
    "INSERT", "DELETE", "DATA", "LOAD", "INTO", "CLEAR", "CREATE", "DROP",
    "COPY", "MOVE", "ADD", "TO", "WITH", "USING", "DEFAULT", "ALL",
    "INCLUDE", "BINDINGS", "LET",
}

HINT_NS = "http://www.bigdata.com/queryHints#"


def _is_hint_triple(tp) -> bool:
    p = tp.p
    return (
        isinstance(p, A.Const)
        and getattr(p.term, "lex", "").startswith(HINT_NS)
    )

AGG_NAMES = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}

BUILTINS = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI", "BNODE",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS",
    "STRBEFORE", "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
    "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1",
    "SHA256", "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT",
    "SAMETERM", "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC",
    "REGEX", "SUBSTR", "REPLACE",
}


class Token:
    __slots__ = ("kind", "value", "pos")

    def __init__(self, kind: str, value: str, pos: int):
        self.kind = kind
        self.value = value
        self.pos = pos

    def __repr__(self):
        return f"{self.kind}({self.value!r})"


def tokenize(text: str) -> list[Token]:
    tokens = []
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SparqlSyntaxError(f"lex error at {i}: {text[i:i+30]!r}")
        kind = m.lastgroup
        if kind == "PLOCAL":
            kind = "PNAME"
        if kind is None and ":" in m.group(0):
            # bare ":" or ":local" — empty prefix name; no named group
            # fires, so lastgroup is None
            kind = "PNAME"
        if kind != "WS":
            val = m.group(0)
            if kind == "NAME" and val.upper() in KEYWORDS | AGG_NAMES | BUILTINS:
                tokens.append(Token("KW", val.upper(), i))
            elif m.group("PNAME") is not None or (val and ":" in val and kind == "PNAME"):
                tokens.append(Token("PNAME", val, i))
            else:
                tokens.append(Token(kind, val, i))
        i = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens


_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


# pre-declared prefixes, matching the reference's PrefixDeclProcessor
# defaults (queries in its test corpus rely on them without declaring)
DEFAULT_PREFIXES = dict(WELL_KNOWN_PREFIXES)


class Parser:
    def __init__(self, text: str):
        self.tokens = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = dict(DEFAULT_PREFIXES)
        self.base = ""
        # query hints stripped from graph patterns (local name -> lex);
        # attached to the parsed query for the engine to honor the few
        # semantics-bearing ones (defaultGraphDistinctFilter,
        # regexMatchNonString)
        self.hints: dict[str, str] = {}
        self._bnode_n = 0

    # ------------------------------------------------------------ helpers
    def peek(self, k: int = 0) -> Token:
        return self.tokens[min(self.i + k, len(self.tokens) - 1)]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.value in kws

    def eat_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise SparqlSyntaxError(f"expected {kws} at {self.peek()!r}")
        return self.next().value

    def _at_name(self, name: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.value.upper() == name

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value == op

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SparqlSyntaxError(f"expected {op!r} at {self.peek()!r}")
        self.next()

    def try_op(self, op: str) -> bool:
        if self.at_op(op):
            self.next()
            return True
        return False

    def fresh_var(self) -> A.Var:
        self._bnode_n += 1
        return A.Var(f"__bn{self._bnode_n}")

    # ------------------------------------------------------------- terms
    def expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"unknown prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def parse_iri(self) -> Term:
        t = self.peek()
        if t.kind == "IRIREF":
            self.next()
            return Term.iri(self.base + t.value[1:-1] if not _is_abs(t.value[1:-1]) and self.base else t.value[1:-1])
        if t.kind == "PNAME":
            self.next()
            return Term.iri(self.expand_pname(t.value))
        raise SparqlSyntaxError(f"expected IRI at {t!r}")

    def parse_rdf_literal(self) -> Term:
        t = self.next()
        raw = t.value
        if raw.startswith(("'''", '"""')):
            lex = _unescape(raw[3:-3])
        else:
            lex = _unescape(raw[1:-1])
        nxt = self.peek()
        if nxt.kind == "LANGTAG":
            self.next()
            return Term.literal(lex, lang=nxt.value[1:])
        if nxt.kind == "OP" and nxt.value == "^^":
            self.next()
            dt = self.parse_iri()
            return Term.literal(lex, dt=dt.lex)
        return Term.literal(lex)

    def parse_term_or_var(self, allow_path: bool = False):
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return A.Var(t.value[1:])
        if t.kind in ("IRIREF", "PNAME"):
            return A.Const(self.parse_iri())
        if t.kind in ("STRING1", "STRING2", "STRING_LONG1", "STRING_LONG2"):
            return A.Const(self.parse_rdf_literal())
        if t.kind == "INTEGER":
            self.next()
            return A.Const(Term.literal(t.value, XSD + "integer"))
        if t.kind == "DECIMAL":
            self.next()
            return A.Const(Term.literal(t.value, XSD + "decimal"))
        if t.kind == "DOUBLE":
            self.next()
            return A.Const(Term.literal(t.value, XSD + "double"))
        if t.kind == "BLANK":
            self.next()
            # bnodes in patterns act as non-projectable variables
            return A.Var("__bnl_" + t.value[2:])
        if t.kind == "KW" and t.value in ("TRUE", "FALSE"):
            self.next()
            return A.Const(Term.boolean(t.value == "TRUE"))
        if t.kind == "KW" and t.value == "A":
            self.next()
            return A.Const(Term.iri(RDF + "type"))
        raise SparqlSyntaxError(f"expected term at {t!r}")

    # ------------------------------------------------------------ prologue
    def parse_prologue(self) -> None:
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                pn = self.next()
                if pn.kind != "PNAME" or not pn.value.endswith(":"):
                    raise SparqlSyntaxError(f"bad PREFIX decl at {pn!r}")
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError("PREFIX needs IRIREF")
                self.prefixes[pn.value[:-1]] = iri.value[1:-1]
            elif self.at_kw("BASE"):
                self.next()
                iri = self.next()
                self.base = iri.value[1:-1]
            else:
                return

    # ----------------------------------------------------------- entry
    def parse_query(self):
        self.parse_prologue()
        if self.at_kw("SELECT"):
            q = self.parse_select()
        elif self.at_kw("ASK"):
            q = self.parse_ask()
        elif self.at_kw("CONSTRUCT"):
            q = self.parse_construct()
        elif self.at_kw("DESCRIBE"):
            q = self.parse_describe()
        else:
            raise SparqlSyntaxError(f"expected query form at {self.peek()!r}")
        q.hints = dict(self.hints)
        if self.peek().kind != "EOF":
            raise SparqlSyntaxError(f"trailing input at {self.peek()!r}")
        return q

    def parse_update(self):
        """Returns a list of update operations."""
        self.parse_prologue()
        ops = []
        while self.peek().kind != "EOF":
            ops.append(self._parse_update_one())
            self.parse_prologue()  # prologue may repeat between ops
            if self.at_op(";"):
                self.next()
                self.parse_prologue()
        return ops

    # ----------------------------------------------------------- SELECT
    def parse_select(self) -> A.SelectQuery:
        self.eat_kw("SELECT")
        distinct = reduced = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        elif self.at_kw("REDUCED"):
            self.next()
            reduced = True
        projections = []
        if self.at_op("*"):
            self.next()
        else:
            while True:
                if self.peek().kind == "VAR":
                    projections.append((A.Var(self.next().value[1:]), None))
                elif self.at_op("("):
                    self.next()
                    expr = self.parse_expression()
                    self.eat_kw("AS")
                    v = self.next()
                    self.eat_op(")")
                    projections.append((A.Var(v.value[1:]), expr))
                else:
                    break
        dataset = self.parse_dataset_clauses()
        # blazegraph named subqueries: WITH { SELECT ... } AS %name
        # (NamedSubqueryRoot in the reference AST)
        named_subqueries = []
        while self.at_kw("WITH"):
            self.next()
            self.eat_op("{")
            sub = self.parse_select()
            self.eat_op("}")
            self.eat_kw("AS")
            tok = self.next()
            if tok.kind != "NAMEDSET":
                raise SparqlSyntaxError(f"expected %name at {tok!r}")
            named_subqueries.append((tok.value[1:], sub))
        if self.at_kw("WHERE"):
            self.next()
        where = self.parse_group_graph_pattern()
        q = A.SelectQuery(projections=projections, where=where, distinct=distinct,
                          reduced=reduced, dataset=dataset,
                          named_subqueries=named_subqueries)
        self.parse_solution_modifiers(q)
        if self.at_kw("VALUES"):
            # the reference evaluates the query-level VALUES clause as
            # *initial* bindings pushed into the WHERE group (solutions
            # flow in, OPTIONALs left-join onto them) rather than a
            # post-WHERE join — observable with a top-level OPTIONAL
            # (bindingsAndBottomUp01a fixture); mirror that
            self.next()
            vp = self.parse_values_body()
            vp.exogenous = True
            q.where.elements.insert(0, vp)
        elif self.at_kw("BINDINGS"):
            # SPARQL 1.1 draft syntax kept by the reference's fixtures:
            # BINDINGS ?x ?y { (v1 v2) ... } — vars unparenthesized.
            # Unlike final-spec VALUES (joined after the WHERE clause),
            # the reference evaluates BINDINGS as *initial* bindings
            # pushed into the WHERE group (solutions-in semantics of
            # the federation draft), so OPTIONALs left-join onto them —
            # prepend to the group to reproduce that.
            self.next()
            vars_ = []
            while self.peek().kind == "VAR":
                vars_.append(A.Var(self.next().value[1:]))
            self.eat_op("{")
            rows = []
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self._parse_data_value())
                self.next()
                rows.append(tuple(row))
            self.eat_op("}")
            q.where.elements.insert(0, A.ValuesPattern(vars_, rows, exogenous=True))
        return q

    def parse_dataset_clauses(self) -> list:
        ds = []
        while self.at_kw("FROM"):
            self.next()
            named = False
            if self.at_kw("NAMED"):
                self.next()
                named = True
            if self.peek().kind == "NAME" and self.peek().value.upper() == "VIRTUAL":
                # blazegraph extension: FROM [NAMED] VIRTUAL GRAPH <vg>
                self.next()
                if self.at_kw("GRAPH"):
                    self.next()
                ds.append(("virtual-named" if named else "virtual-default", self.parse_iri()))
            else:
                ds.append(("named" if named else "default", self.parse_iri()))
        return ds

    def parse_solution_modifiers(self, q) -> None:
        if self.at_kw("GROUP"):
            self.next()
            self.eat_kw("BY")
            while True:
                if self.at_op("("):
                    self.next()
                    e = self.parse_expression()
                    if self.at_kw("AS"):
                        self.next()
                        v = A.Var(self.next().value[1:])
                        q.group_by.append((e, v))
                    else:
                        q.group_by.append(e)
                    self.eat_op(")")
                elif self.peek().kind == "VAR":
                    q.group_by.append(A.Var(self.next().value[1:]))
                elif self.peek().kind in ("IRIREF", "PNAME") or (
                    self.peek().kind == "KW" and self.peek().value in BUILTINS
                ):
                    q.group_by.append(self.parse_primary_expression())
                else:
                    break
        if self.at_kw("HAVING"):
            self.next()
            while self.at_op("("):
                self.next()
                q.having.append(self.parse_expression())
                self.eat_op(")")
        if self.at_kw("ORDER"):
            self.next()
            self.eat_kw("BY")
            while True:
                if self.at_kw("ASC", "DESC"):
                    asc = self.next().value == "ASC"
                    self.eat_op("(")
                    e = self.parse_expression()
                    self.eat_op(")")
                    q.order_by.append((e, asc))
                elif self.peek().kind == "VAR":
                    q.order_by.append((A.Var(self.next().value[1:]), True))
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expression()
                    self.eat_op(")")
                    q.order_by.append((e, True))
                elif self.peek().kind == "KW" and self.peek().value in BUILTINS:
                    q.order_by.append((self.parse_primary_expression(), True))
                else:
                    break
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.next()
                q.limit = int(self.next().value)
            elif self.at_kw("OFFSET"):
                self.next()
                q.offset = int(self.next().value)

    def parse_ask(self) -> A.AskQuery:
        self.eat_kw("ASK")
        dataset = self.parse_dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        q = A.AskQuery(where=self.parse_group_graph_pattern(), dataset=dataset)
        # ASK admits the full solution-modifier tail grammatically
        # (reference corpus: ticket-618g); grouping/ordering can't change
        # whether the solution multiset is non-empty, so parse + discard
        self.parse_solution_modifiers(A.SelectQuery(projections=[], where=q.where))
        return q

    def parse_construct(self) -> A.ConstructQuery:
        self.eat_kw("CONSTRUCT")
        template = []
        if self.at_op("{"):
            template = self.parse_triples_template()
            dataset = self.parse_dataset_clauses()
            if self.at_kw("WHERE"):
                self.next()
            where = self.parse_group_graph_pattern()
        else:
            # CONSTRUCT WHERE { template }
            dataset = self.parse_dataset_clauses()
            self.eat_kw("WHERE")
            template = self.parse_triples_template()
            where = A.GroupPattern(list(template))
        q = A.ConstructQuery(template=template, where=where, dataset=dataset)
        sq = A.SelectQuery(projections=[], where=where)
        self.parse_solution_modifiers(sq)
        q.limit, q.offset = sq.limit, sq.offset
        return q

    def parse_describe(self) -> A.DescribeQuery:
        self.eat_kw("DESCRIBE")
        targets = []
        if self.at_op("*"):
            self.next()
        else:
            while self.peek().kind in ("VAR", "IRIREF", "PNAME"):
                targets.append(self.parse_term_or_var())
        self.parse_dataset_clauses()
        where = None
        if self.at_kw("WHERE") or self.at_op("{"):
            if self.at_kw("WHERE"):
                self.next()
            where = self.parse_group_graph_pattern()
        return A.DescribeQuery(targets=targets, where=where)

    def parse_triples_template(self) -> list:
        self.eat_op("{")
        triples = []
        while not self.at_op("}"):
            triples.extend(self.parse_triples_same_subject())
            if not self.try_op("."):
                break
        self.eat_op("}")
        return triples

    # ---------------------------------------------------------- patterns
    def parse_let(self) -> A.BindPattern:
        """Blazegraph LET extension: ``LET (?v := expr)`` ≡
        ``BIND(expr AS ?v)`` (same AssignmentNode in the reference's
        grammar — sparql.jj LetClause)."""
        self.eat_op("(")
        v = self.next()
        if v.kind != "VAR":
            raise SparqlSyntaxError(f"expected variable after LET( at {v!r}")
        # ':=' lexes as a bare-colon PNAME followed by '='
        t = self.next()
        if not (t.kind == "PNAME" and t.value == ":"):
            raise SparqlSyntaxError(f"expected := in LET at {t!r}")
        self.eat_op("=")
        e = self.parse_expression()
        self.eat_op(")")
        return A.BindPattern(e, A.Var(v.value[1:]))

    def parse_group_graph_pattern(self) -> A.GroupPattern:
        self.eat_op("{")
        group = A.GroupPattern()
        while not self.at_op("}"):
            if self.at_kw("SELECT"):
                group.elements.append(A.SubSelect(self.parse_select()))
            elif self.at_kw("INCLUDE"):
                self.next()
                tok = self.next()
                if tok.kind != "NAMEDSET":
                    raise SparqlSyntaxError(f"expected %name at {tok!r}")
                group.elements.append(A.NamedSubqueryInclude(tok.value[1:]))
                self.try_op(".")
            elif self.at_op("{"):
                inner = self.parse_group_graph_pattern()
                if self.at_kw("UNION"):
                    branches = [inner]
                    while self.at_kw("UNION"):
                        self.next()
                        branches.append(self.parse_group_graph_pattern())
                    group.elements.append(A.UnionPattern(branches))
                else:
                    group.elements.append(inner)
            elif self.at_kw("OPTIONAL"):
                self.next()
                group.elements.append(A.OptionalPattern(self.parse_group_graph_pattern()))
            elif self.at_kw("MINUS"):
                self.next()
                group.elements.append(A.MinusPattern(self.parse_group_graph_pattern()))
            elif self.at_kw("GRAPH"):
                self.next()
                g = self.parse_term_or_var()
                group.elements.append(A.GraphPattern(g, self.parse_group_graph_pattern()))
            elif self.at_kw("SERVICE"):
                self.next()
                silent = False
                if self.at_kw("SILENT"):
                    self.next()
                    silent = True
                ep = self.parse_term_or_var()
                group.elements.append(
                    A.ServicePattern(ep, self.parse_group_graph_pattern(), silent)
                )
            elif self.at_kw("FILTER"):
                self.next()
                group.elements.append(A.FilterPattern(self.parse_constraint()))
            elif self.at_kw("BIND"):
                self.next()
                self.eat_op("(")
                e = self.parse_expression()
                self.eat_kw("AS")
                v = self.next()
                self.eat_op(")")
                group.elements.append(A.BindPattern(e, A.Var(v.value[1:])))
            elif self.at_kw("LET"):
                self.next()
                group.elements.append(self.parse_let())
            elif self.at_kw("VALUES"):
                self.next()
                group.elements.append(self.parse_values_body())
            else:
                group.elements.append(A.GroupPattern(self.parse_triples_same_subject()))
                while self.try_op("."):
                    if self.at_op("}"):
                        break
                    if self.peek().kind in ("VAR", "IRIREF", "PNAME", "BLANK", "INTEGER",
                                            "DECIMAL", "DOUBLE", "STRING1", "STRING2",
                                            "STRING_LONG1", "STRING_LONG2") or self.at_op("["):
                        group.elements.append(
                            A.GroupPattern(self.parse_triples_same_subject())
                        )
                    else:
                        break
            self.try_op(".")
        self.eat_op("}")
        # flatten adjacent plain BGP groups; drop query-hint magic
        # triples (hint:Query hint:optimizer ... — consumed by the
        # reference's ASTQueryHintOptimizer as physical-planner hints,
        # never matched against data; Catalyst owns physical planning
        # here, so they are accepted and ignored)
        flat = A.GroupPattern()
        for el in group.elements:
            if isinstance(el, A.GroupPattern) and all(
                isinstance(x, A.TriplePattern) for x in el.elements
            ):
                for x in el.elements:
                    if _is_hint_triple(x):
                        if isinstance(x.o, A.Const):
                            self.hints[x.p.term.lex[len(HINT_NS):]] = x.o.term.lex
                    else:
                        flat.elements.append(x)
            else:
                flat.elements.append(el)
        return flat

    def parse_values_body(self) -> A.ValuesPattern:
        vars_, rows = [], []
        if self.at_op("("):
            self.next()
            while self.peek().kind == "VAR":
                vars_.append(A.Var(self.next().value[1:]))
            self.eat_op(")")
            self.eat_op("{")
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self._parse_data_value())
                self.next()
                rows.append(tuple(row))
            self.eat_op("}")
        else:
            vars_.append(A.Var(self.next().value[1:]))
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append((self._parse_data_value(),))
            self.next()
        return A.ValuesPattern(vars_, rows)

    def _parse_data_value(self):
        if self.at_kw("UNDEF"):
            self.next()
            return None
        v = self.parse_term_or_var()
        if isinstance(v, A.Var):
            raise SparqlSyntaxError("VALUES rows must be constants or UNDEF")
        return v.term

    def _at_embedded(self) -> bool:
        return (
            self.at_op("<")
            and self.peek(1).kind == "OP"
            and self.peek(1).value == "<"
        )

    def _parse_embedded(self, triples: list):
        """RDF* embedded pattern << s p o >> (SIDs semantics: asserts
        the inner pattern and denotes its statement identifier).
        Constants fold to a concrete sid term; otherwise a fresh var is
        bound to sid(s,p,o) after the inner pattern joins."""
        from ..terms import statement_sid

        self.eat_op("<")
        self.eat_op("<")
        s = self._parse_embedded(triples) if self._at_embedded() else self.parse_term_or_var()
        p = self.parse_term_or_var()
        o = self._parse_embedded(triples) if self._at_embedded() else self.parse_term_or_var()
        self.eat_op(">")
        self.eat_op(">")
        triples.append(A.TriplePattern(s, p, o))
        if all(isinstance(x, A.Const) for x in (s, p, o)):
            return A.Const(statement_sid(s.term, p.term, o.term))
        v = self.fresh_var()
        triples.append(A.BindPattern(A.SidExpr(s, p, o), v))
        return v

    def parse_triples_same_subject(self) -> list:
        triples = []
        if self.at_op("["):
            s = self._parse_bnode_props(triples)
        elif self._at_embedded():
            s = self._parse_embedded(triples)
        else:
            s = self.parse_term_or_var()
        # predicate-object list
        while True:
            p = self.parse_path_or_var()
            while True:
                o = self._parse_object(triples)
                triples.append(A.TriplePattern(s, p, o))
                if not self.try_op(","):
                    break
            if not self.try_op(";"):
                break
            if self.at_op(".") or self.at_op("}") or self.peek().kind == "EOF":
                break
        return triples

    def _parse_object(self, triples: list):
        if self.at_op("["):
            return self._parse_bnode_props(triples)
        if self._at_embedded():
            return self._parse_embedded(triples)
        return self.parse_term_or_var()

    def _parse_bnode_props(self, triples: list):
        self.eat_op("[")
        v = self.fresh_var()
        if not self.at_op("]"):
            while True:
                p = self.parse_path_or_var()
                while True:
                    o = self._parse_object(triples)
                    triples.append(A.TriplePattern(v, p, o))
                    if not self.try_op(","):
                        break
                if not self.try_op(";"):
                    break
                if self.at_op("]"):
                    break
        self.eat_op("]")
        return v

    # ------------------------------------------------------------- paths
    def parse_path_or_var(self):
        if self.peek().kind == "VAR":
            return A.Var(self.next().value[1:])
        path = self.parse_path_alt()
        if isinstance(path, A.PathIRI):
            return A.Const(path.iri)  # plain predicate
        return path

    def parse_path_alt(self):
        parts = [self.parse_path_seq()]
        while self.at_op("|"):
            self.next()
            parts.append(self.parse_path_seq())
        return parts[0] if len(parts) == 1 else A.PathAlt(tuple(parts))

    def parse_path_seq(self):
        parts = [self.parse_path_elt()]
        while self.at_op("/"):
            self.next()
            parts.append(self.parse_path_elt())
        return parts[0] if len(parts) == 1 else A.PathSeq(tuple(parts))

    def parse_path_elt(self):
        inverse = False
        if self.at_op("^"):
            self.next()
            inverse = True
        p = self.parse_path_primary()
        while self.peek().kind == "OP" and self.peek().value in ("*", "+", "?"):
            mod = self.next().value
            p = A.PathMod(p, mod)
        return A.PathInv(p) if inverse else p

    def parse_path_primary(self):
        if self.at_op("("):
            self.next()
            p = self.parse_path_alt()
            self.eat_op(")")
            return p
        if self.at_op("!"):
            self.next()
            fwd, inv = [], []
            if self.at_op("("):
                self.next()
                while True:
                    if self.at_op("^"):
                        self.next()
                        inv.append(self.parse_iri())
                    else:
                        fwd.append(self._parse_iri_or_a())
                    if not self.try_op("|"):
                        break
                self.eat_op(")")
            else:
                if self.at_op("^"):
                    self.next()
                    inv.append(self.parse_iri())
                else:
                    fwd.append(self._parse_iri_or_a())
            return A.PathNeg(tuple(fwd), tuple(inv))
        return A.PathIRI(self._parse_iri_or_a())

    def _parse_iri_or_a(self) -> Term:
        if self.at_kw("A"):
            self.next()
            return Term.iri(RDF + "type")
        return self.parse_iri()

    # -------------------------------------------------------- expressions
    def parse_constraint(self):
        if self.at_op("("):
            return self.parse_bracketted()
        return self.parse_primary_expression()

    def parse_bracketted(self):
        self.eat_op("(")
        e = self.parse_expression()
        self.eat_op(")")
        return e

    def parse_expression(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_and()
        while self.at_op("||"):
            self.next()
            e = A.Op("||", (e, self.parse_and()))
        return e

    def parse_and(self):
        e = self.parse_relational()
        while self.at_op("&&"):
            self.next()
            e = A.Op("&&", (e, self.parse_relational()))
        return e

    def parse_relational(self):
        e = self.parse_additive()
        t = self.peek()
        if t.kind == "OP" and t.value in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return A.Op(t.value, (e, self.parse_additive()))
        if self.at_kw("IN"):
            self.next()
            return A.InExpr(e, tuple(self._parse_expression_list()), False)
        if self.at_kw("NOT") and self.peek(1).kind == "KW" and self.peek(1).value == "IN":
            self.next()
            self.next()
            return A.InExpr(e, tuple(self._parse_expression_list()), True)
        return e

    def _parse_expression_list(self):
        self.eat_op("(")
        out = []
        if not self.at_op(")"):
            out.append(self.parse_expression())
            while self.try_op(","):
                out.append(self.parse_expression())
        self.eat_op(")")
        return out

    def parse_additive(self):
        e = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in ("+", "-"):
                op = self.next().value
                e = A.Op(op, (e, self.parse_multiplicative()))
            elif t.kind in ("INTEGER", "DECIMAL", "DOUBLE") and t.value[0] in "+-":
                # "?x+5" lexes the sign into the numeric literal
                # (SPARQL grammar quirk); re-split it as addition
                tok = self.next()
                dt = {"INTEGER": "integer", "DECIMAL": "decimal", "DOUBLE": "double"}
                lit = A.Const(Term.literal(tok.value[1:], XSD + dt[tok.kind]))
                e = A.Op(tok.value[0], (e, lit))
            else:
                return e

    def parse_multiplicative(self):
        e = self.parse_unary()
        while self.peek().kind == "OP" and self.peek().value in ("*", "/"):
            op = self.next().value
            e = A.Op(op, (e, self.parse_unary()))
        return e

    def parse_unary(self):
        if self.at_op("!"):
            self.next()
            return A.Op("!", (self.parse_unary(),))
        if self.at_op("-"):
            self.next()
            return A.Op("neg", (self.parse_unary(),))
        if self.at_op("+"):
            self.next()
            return self.parse_unary()
        return self.parse_primary_expression()

    def parse_primary_expression(self):
        t = self.peek()
        if t.kind == "OP" and t.value == "(":
            return self.parse_bracketted()
        if t.kind == "KW":
            kw = t.value
            if kw in AGG_NAMES:
                return self.parse_aggregate()
            if kw == "NOT":  # NOT EXISTS
                self.next()
                self.eat_kw("EXISTS")
                return A.ExistsExpr(self.parse_group_graph_pattern(), True)
            if kw == "EXISTS":
                self.next()
                return A.ExistsExpr(self.parse_group_graph_pattern(), False)
            if kw in BUILTINS:
                self.next()
                args = []
                if kw == "NOW" or self.at_op("("):
                    args = self._parse_expression_list() if self.at_op("(") else []
                return A.FuncCall(kw, tuple(args))
        if t.kind in ("IRIREF", "PNAME"):
            # function call with IRI name (e.g. xsd:integer(?x)) or plain IRI
            iri = self.parse_iri()
            if self.at_op("("):
                from .functions import CUSTOM_AGGREGATES

                if iri.lex in CUSTOM_AGGREGATES:
                    # registered custom aggregate (IAggregate analog):
                    # parse with the aggregate-call shape (DISTINCT ok)
                    self.next()
                    distinct = False
                    if self.at_kw("DISTINCT"):
                        self.next()
                        distinct = True
                    expr = self.parse_expression()
                    self.eat_op(")")
                    return A.AggExpr(iri.lex, expr, distinct)
                return A.FuncCall(iri.lex, tuple(self._parse_expression_list()))
            return A.Const(iri)
        v = self.parse_term_or_var()
        return v

    def parse_aggregate(self):
        name = self.next().value
        self.eat_op("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        if name == "COUNT" and self.at_op("*"):
            self.next()
            self.eat_op(")")
            return A.AggExpr("COUNT", None, distinct)
        expr = self.parse_expression()
        sep = " "
        if name == "GROUP_CONCAT" and self.at_op(";"):
            self.next()
            sepname = self.next()  # SEPARATOR (lexed as NAME)
            if sepname.value.upper() != "SEPARATOR":
                raise SparqlSyntaxError("expected SEPARATOR")
            self.eat_op("=")
            sep_term = self.parse_rdf_literal()
            sep = sep_term.lex
        self.eat_op(")")
        return A.AggExpr(name, expr, distinct, sep)

    # ------------------------------------------------------------ update
    def _parse_update_one(self):
        if self.at_kw("INSERT") and self.peek(1).kind == "KW" and self.peek(1).value == "DATA":
            self.next(), self.next()
            return A.InsertData(self._parse_quad_data())
        if self.at_kw("DELETE") and self.peek(1).kind == "KW" and self.peek(1).value == "DATA":
            self.next(), self.next()
            return A.DeleteData(self._parse_quad_data())
        if self.at_kw("LOAD"):
            self.next()
            silent = self._eat_silent()
            src = self.parse_iri()
            graph = None
            if self.at_kw("INTO"):
                self.next()
                self.eat_kw("GRAPH")
                graph = self.parse_iri()
            return A.LoadUpdate(src, graph, silent)
        if self.at_kw("CLEAR"):
            self.next()
            return A.ClearUpdate(self._parse_graph_ref(), False)
        if self.at_kw("DROP"):
            self.next()
            if self._at_name("ENTAILMENTS"):
                self.next()
                return A.EntailmentsUpdate("DROP")
            return A.DropUpdate(self._parse_graph_ref(), False)
        if self.at_kw("CREATE"):
            self.next()
            silent = self._eat_silent()
            if self._at_name("ENTAILMENTS"):
                self.next()
                return A.EntailmentsUpdate("CREATE")
            self.eat_kw("GRAPH")
            return A.CreateUpdate(self.parse_iri(), silent)
        if self._at_name("ENABLE") or self._at_name("DISABLE"):
            op = self.next().value.upper()
            if not self._at_name("ENTAILMENTS"):
                raise SparqlSyntaxError(f"expected ENTAILMENTS after {op}")
            self.next()
            return A.EntailmentsUpdate(op)
        if self.at_kw("COPY", "MOVE", "ADD"):
            op = self.next().value
            silent = self._eat_silent()
            src = self._parse_graph_or_default()
            self.eat_kw("TO")
            dst = self._parse_graph_or_default()
            return A.CopyMoveAdd(op, src, dst, silent)
        # [WITH iri] DELETE {...} INSERT {...} WHERE {...}
        with_graph = None
        if self.at_kw("WITH"):
            self.next()
            with_graph = self.parse_iri()
        delete_templates, insert_templates = [], []
        if self.at_kw("DELETE"):
            self.next()
            if self.at_kw("WHERE"):
                self.next()
                tmpl = self.parse_triples_template()
                return A.Modify(tmpl, [], A.GroupPattern(list(tmpl)), with_graph)
            delete_templates = self.parse_triples_template()
        if self.at_kw("INSERT"):
            self.next()
            insert_templates = self.parse_triples_template()
        using: list | None = None
        while self.at_kw("USING"):
            self.next()
            using = using or []
            if self.at_kw("NAMED"):
                self.next()
                using.append(("named", self.parse_iri()))
            else:
                using.append(("default", self.parse_iri()))
        self.eat_kw("WHERE")
        where = self.parse_group_graph_pattern()
        return A.Modify(delete_templates, insert_templates, where, with_graph, using)

    def _eat_silent(self) -> bool:
        if self.at_kw("SILENT"):
            self.next()
            return True
        return False

    def _parse_graph_ref(self):
        if self.at_kw("SILENT"):
            self.next()
        if self.at_kw("DEFAULT"):
            self.next()
            return "DEFAULT"
        if self.at_kw("NAMED"):
            self.next()
            return "NAMED"
        if self.at_kw("ALL"):
            self.next()
            return "ALL"
        self.eat_kw("GRAPH")
        return self.parse_iri()

    def _parse_graph_or_default(self):
        if self.at_kw("DEFAULT"):
            self.next()
            return "DEFAULT"
        if self.at_kw("GRAPH"):
            self.next()
        return self.parse_iri()

    def _parse_quad_data(self) -> list:
        """{ triples (GRAPH <g> { triples })* } → [(s,p,o,g)]"""
        self.eat_op("{")
        quads = []
        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.next()
                g = self.parse_iri()
                inner = self.parse_triples_template()
                for t in inner:
                    quads.append((t.s.term, t.p.term, t.o.term, g))
            else:
                while not (self.at_op("}") or self.at_kw("GRAPH")):
                    for t in self.parse_triples_same_subject():
                        quads.append((t.s.term, t.p.term, t.o.term, None))
                    if not self.try_op("."):
                        break
        self.eat_op("}")
        return quads


def _is_abs(iri: str) -> bool:
    return re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri) is not None


def parse_query(text: str):
    return Parser(text).parse_query()


def parse_update(text: str):
    return Parser(text).parse_update()
