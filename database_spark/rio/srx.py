"""SPARQL Query Results XML Format (SRX) parser + result-set compare.

The reference consumes/produces this format through Sesame
(``BigdataSPARQLResultsXMLParser`` wiring under bigdata-rdf/.../rio/)
and its data-driven tests compare expected ``.srx`` files against
query output with blank-node-isomorphic multiset equality
(``AbstractDataDrivenSPARQLTestCase.java`` → Sesame QueryResultUtil).
This module provides both halves for our TCK harness.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from decimal import Decimal, InvalidOperation

from .. import terms as T
from ..terms import Term

_NS = "{http://www.w3.org/2005/sparql-results#}"


def parse_srx(text: str):
    """Parse SRX → dict with ``vars``, ``rows`` (list of var→Term
    dicts; absent var = unbound), and ``boolean`` (ASK results)."""
    root = ET.fromstring(text)
    head = root.find(_NS + "head")
    vars_ = [v.get("name") for v in head.findall(_NS + "variable")] if head is not None else []
    boolean = root.find(_NS + "boolean")
    if boolean is not None:
        return {"vars": vars_, "rows": None, "boolean": boolean.text.strip() == "true"}
    rows = []
    results = root.find(_NS + "results")
    if results is not None:
        for result in results.findall(_NS + "result"):
            row = {}
            for b in result.findall(_NS + "binding"):
                name = b.get("name")
                row[name] = _parse_binding(b)
            rows.append(row)
    return {"vars": vars_, "rows": rows, "boolean": None}


def _parse_binding(b) -> Term:
    for child in b:
        tag = child.tag.removeprefix(_NS)
        if tag == "uri":
            # whitespace inside <uri> is XML formatting, not IRI
            # content (Sesame's SRX parser trims it; bsbm-bi-q5.srx
            # line-wraps its IRIs)
            return Term.iri((child.text or "").strip())
        if tag == "bnode":
            return Term.bnode(child.text or "")
        if tag == "literal":
            dt = child.get("datatype")
            lang = child.get("{http://www.w3.org/XML/1998/namespace}lang")
            return Term.literal(child.text or "", dt=dt, lang=lang)
    raise ValueError(f"empty binding {b.get('name')!r}")


# ------------------------------------------------------------------ compare
_NUM_FAMILY = T.NUMERIC_DATATYPES


def _numeric_value(term: Term):
    if term.kind != T.KIND_LITERAL or term.dt not in _NUM_FAMILY:
        return None
    try:
        return Decimal(term.lex)
    except InvalidOperation:
        try:
            return Decimal(repr(float(term.lex)))
        except (ValueError, InvalidOperation):
            return None


_TEMPORAL_DTS = {T.XSD_DATETIME, T.XSD_DATE}


def _temporal_value(term: Term):
    if term.kind != T.KIND_LITERAL or term.dt not in _TEMPORAL_DTS:
        return None
    from datetime import datetime, timezone

    lex = term.lex.strip().replace("Z", "+00:00")
    try:
        v = datetime.fromisoformat(lex)
    except ValueError:
        return None
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return v


def _term_eq(a: Term | None, b: Term | None, bij: dict, rev: dict) -> bool:
    """Equality under a (mutable) bnode bijection.  Numeric literals
    compare by value within the same promotion family (the reference's
    fixtures intentionally vary lexical forms, e.g. "3.0" vs "3")."""
    if a is None or b is None:
        return a is None and b is None
    if a.kind != b.kind:
        return False
    if a.kind == T.KIND_BNODE:
        if a.lex in bij:
            return bij[a.lex] == b.lex
        if b.lex in rev:
            return False
        bij[a.lex] = b.lex
        rev[b.lex] = a.lex
        return True
    if a.kind == T.KIND_LITERAL:
        va, vb = _numeric_value(a), _numeric_value(b)
        if va is not None and vb is not None:
            same_family = _NUM_FAMILY.get(a.dt) == _NUM_FAMILY.get(b.dt)
            return same_family and va == vb
        ta, tb = _temporal_value(a), _temporal_value(b)
        if ta is not None and tb is not None:
            return a.dt == b.dt and ta == tb
        return (
            a.lex == b.lex
            and a.dt == b.dt
            and (a.lang or "").lower() == (b.lang or "").lower()
        )
    return a.lex == b.lex


def _row_eq(a: dict, b: dict, bij: dict, rev: dict) -> bool:
    if set(a) != set(b):
        return False
    for k in a:
        if not _term_eq(a[k], b[k], bij, rev):
            return False
    return True


def _match(expected: list, got: list, bij: dict, rev: dict, used: list) -> bool:
    if not expected:
        return True
    head, rest = expected[0], expected[1:]
    for i, g in enumerate(got):
        if used[i]:
            continue
        trial_bij, trial_rev = dict(bij), dict(rev)
        if _row_eq(head, g, trial_bij, trial_rev):
            used[i] = True
            if _match(rest, got, trial_bij, trial_rev, used):
                return True
            used[i] = False
    return False


def results_equal(expected: list, got: list, ordered: bool = False) -> bool:
    """Multiset (or sequence, if ordered) equality of binding sets
    under blank-node isomorphism."""
    if len(expected) != len(got):
        return False
    if ordered:
        bij: dict = {}
        rev: dict = {}
        return all(_row_eq(e, g, bij, rev) for e, g in zip(expected, got))
    # bnode-free fast path (large fixtures like lubm-q06 with 6k+
    # rows would blow the recursive matcher): canonicalize each term
    # exactly as _term_eq compares it and compare multisets
    def has_bnode(rows):
        return any(
            t is not None and t.kind == T.KIND_BNODE
            for row in rows
            for t in row.values()
        )

    if not has_bnode(expected) and not has_bnode(got):
        def canon_term(t):
            if t is None:
                return None
            if t.kind == T.KIND_LITERAL:
                v = _numeric_value(t)
                if v is not None:
                    return ("num", _NUM_FAMILY.get(t.dt), v)
                tv = _temporal_value(t)
                if tv is not None:
                    return ("tmp", t.dt, tv)
                return ("lit", t.lex, t.dt, (t.lang or "").lower())
            return (t.kind, t.lex)

        def canon_row(row):
            return tuple(sorted((k, canon_term(t)) for k, t in row.items()))

        from collections import Counter

        return Counter(map(canon_row, expected)) == Counter(map(canon_row, got))

    # cheap pre-sort to keep the backtracking shallow
    def key(row):
        return sorted(
            (k, t.kind, "" if t.kind == T.KIND_BNODE else t.lex, t.dt or "", t.lang or "")
            for k, t in row.items()
        )

    return _match(sorted(expected, key=key), got, {}, {}, [False] * len(got))


def rows_to_terms(rows, vars_) -> list:
    """Spark Row objects (term-struct per var) → list of var→Term dicts."""
    out = []
    for r in rows:
        d = {}
        for v in vars_:
            cell = r[v]
            if cell is None:
                continue
            kind, lex, dt, lang = cell["kind"], cell["lex"], cell["dt"], cell["lang"]
            d[v] = Term(kind, lex, dt, lang)
        out.append(d)
    return out
