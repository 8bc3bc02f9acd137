"""Result + RDF writers.

Reference: SPARQL results serializers
(`RDF/rdf/rio/json/BigdataSPARQLResultsJSONWriter.java`, SPARQL-XML
sibling, TSV via Sesame) and statement writers
(`rio/turtle/BigdataTurtleWriter.java`, N-Triples).

Design: two tiers.
* Driver-side serializers for query RESULTS (`SelectResult` → W3C
  SPARQL-Results JSON / XML / CSV / TSV strings) — results are
  human-sized; we iterate with `toLocalIterator` so a large result
  never materializes as one driver list.
* Distributed statement writer for CONSTRUCT/dump outputs: the N-Triples
  line is built as a COLUMN expression (term → N3 lexical form) and
  written with `df.write.text` — scales to any size, no driver
  bottleneck.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape as xml_escape

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import terms as T


# ------------------------------------------------------------ term → JSON


def _term_json(row_val) -> dict | None:
    if row_val is None:
        return None
    kind, lex, dt, lang = row_val["kind"], row_val["lex"], row_val["dt"], row_val["lang"]
    if kind == T.KIND_IRI:
        return {"type": "uri", "value": lex}
    if kind == T.KIND_BNODE:
        return {"type": "bnode", "value": lex}
    out = {"type": "literal", "value": lex}
    if lang:
        out["xml:lang"] = lang
    elif dt and dt != T.XSD_STRING:
        out["datatype"] = dt
    return out


def results_json(result) -> str:
    """SelectResult → W3C SPARQL 1.1 Query Results JSON string."""
    bindings = []
    for row in result.df.toLocalIterator():
        b = {}
        for v in result.vars:
            tj = _term_json(row[v])
            if tj is not None:
                b[v] = tj
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": list(result.vars)}, "results": {"bindings": bindings}}
    )


def results_xml(result) -> str:
    """SelectResult → SPARQL Query Results XML string."""
    parts = [
        '<?xml version="1.0"?>',
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
        "<head>",
    ]
    parts += [f'<variable name="{v}"/>' for v in result.vars]
    parts += ["</head>", "<results>"]
    for row in result.df.toLocalIterator():
        parts.append("<result>")
        for v in result.vars:
            t = row[v]
            if t is None:
                continue
            kind, lex = t["kind"], xml_escape(t["lex"] or "")
            if kind == T.KIND_IRI:
                inner = f"<uri>{lex}</uri>"
            elif kind == T.KIND_BNODE:
                inner = f"<bnode>{lex}</bnode>"
            elif t["lang"]:
                inner = f'<literal xml:lang="{t["lang"]}">{lex}</literal>'
            elif t["dt"] and t["dt"] != T.XSD_STRING:
                inner = f'<literal datatype="{xml_escape(t["dt"])}">{lex}</literal>'
            else:
                inner = f"<literal>{lex}</literal>"
            parts.append(f'<binding name="{v}">{inner}</binding>')
        parts.append("</result>")
    parts += ["</results>", "</sparql>"]
    return "".join(parts)


def _csv_cell(t, sep: str) -> str:
    if t is None:
        return ""
    lex = t["lex"] or ""
    if sep == "\t":
        # TSV uses full N3 forms per the W3C spec
        return _n3_py(t)
    if any(c in lex for c in (",", '"', "\n")):
        return '"' + lex.replace('"', '""') + '"'
    return lex


def _n3_py(t) -> str:
    kind, lex = t["kind"], t["lex"]
    if kind == T.KIND_IRI:
        return f"<{lex}>"
    if kind == T.KIND_BNODE:
        return f"_:{lex}"
    esc = (
        lex.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )
    if t["lang"]:
        return f'"{esc}"@{t["lang"]}'
    if t["dt"] and t["dt"] != T.XSD_STRING:
        return f'"{esc}"^^<{t["dt"]}>'
    return f'"{esc}"'


def results_csv(result, sep: str = ",") -> str:
    lines = [sep.join(result.vars)]
    for row in result.df.toLocalIterator():
        lines.append(sep.join(_csv_cell(row[v], sep) for v in result.vars))
    return "\n".join(lines) + "\n"


def results_tsv(result) -> str:
    lines = ["\t".join("?" + v for v in result.vars)]
    for row in result.df.toLocalIterator():
        lines.append(
            "\t".join("" if row[v] is None else _n3_py(row[v]) for v in result.vars)
        )
    return "\n".join(lines) + "\n"


# --------------------------------------------------- distributed N-Triples


def _esc_literal(lex: Column) -> Column:
    """Escape a literal's lexical form for STRING_LITERAL_QUOTE (shared
    by the N-Triples and Turtle writers).  Mirrors the reference's
    Sesame ``TurtleUtil.encodeString``: backslash, quote, and the \\t
    \\n \\r control characters — a raw CR/TAB inside a quoted string is
    forbidden by the grammar, so CRLF text must be escaped or the dump
    does not round-trip."""
    esc = F.regexp_replace(lex, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, '"', '\\\\"')
    esc = F.regexp_replace(esc, "\t", r"\\t")
    esc = F.regexp_replace(esc, "\n", r"\\n")
    return F.regexp_replace(esc, "\r", r"\\r")


def n3_col(t: Column) -> Column:
    """Term struct → its N3 lexical form, as a pure column expression
    (stays in codegen for arbitrarily large dumps)."""
    lex = t.getField("lex")
    esc = _esc_literal(lex)
    return (
        F.when(t.getField("kind") == T.KIND_IRI, F.concat(F.lit("<"), lex, F.lit(">")))
        .when(t.getField("kind") == T.KIND_BNODE, F.concat(F.lit("_:"), lex))
        .when(
            t.getField("lang").isNotNull(),
            F.concat(F.lit('"'), esc, F.lit('"@'), t.getField("lang")),
        )
        .when(
            t.getField("dt").isNotNull() & (t.getField("dt") != T.XSD_STRING),
            F.concat(F.lit('"'), esc, F.lit('"^^<'), t.getField("dt"), F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    )


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """(st, pt, ot) → one-column DataFrame of N-Triples lines."""
    return triples.select(
        F.concat_ws(
            " ",
            n3_col(F.col("st")),
            n3_col(F.col("pt")),
            n3_col(F.col("ot")),
            F.lit("."),
        ).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Distributed N-Triples dump (any size; one file per partition)."""
    ntriples_lines(triples).write.mode("overwrite").text(path)


# ------------------------------------------------------- abbreviated Turtle
#
# Reference: ``rio/turtle/BigdataTurtleWriter.java`` (prefixed,
# subject-grouped, predicate-list abbreviated Turtle).  Spark design:
# term→Turtle rendering and subject-block assembly are pure column
# expressions over two hash aggregations ((s,p)→objects, s→predicate
# list), so the dump scales like any groupBy; only the @prefix header
# is driver-side.

RDF_TYPE = T.RDF + "type"

#: conservative PN_LOCAL / PN_PREFIX shapes — anything outside falls
#: back to the full <IRI> form, which is always valid
_PN_LOCAL_RE = "^[A-Za-z_][A-Za-z0-9_-]*$"
_INT_RE = "^[+-]?[0-9]+$"
_DEC_RE = r"^[+-]?[0-9]*\.[0-9]+$"
_DBL_RE = r"^[+-]?([0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+$"


def infer_prefixes(triples: DataFrame, max_prefixes: int = 8) -> dict:
    """Namespace table for the dump: top-N namespaces by triple count
    (bounded aggregate + driver collect of N rows), named ns1..nsN,
    merged under the well-known table (rdf:/rdfs:/xsd:/…)."""
    iris = None
    for c in ("st", "pt", "ot"):
        one = triples.select(F.col(c).getField("lex").alias("iri")).where(
            F.col(c).getField("kind") == T.KIND_IRI
        )
        iris = one if iris is None else iris.unionByName(one)
    ns = (
        iris.select(
            F.regexp_extract("iri", r"^(.*[/#])[^/#]*$", 1).alias("ns")
        )
        .where(F.length("ns") > 1)
        .groupBy("ns")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "ns")
        .limit(max_prefixes)
        .collect()
    )
    known = {v: k for k, v in T.WELL_KNOWN_PREFIXES.items()}
    out: dict[str, str] = {}
    i = 0
    for r in ns:
        if r["ns"] in known:
            out[known[r["ns"]]] = r["ns"]
        else:
            i += 1
            out[f"ns{i}"] = r["ns"]
    return out


def _ttl_iri(lex: Column, prefixes: dict) -> Column:
    """IRI lexical → prefixed name where a namespace matches and the
    local part is PN_LOCAL-safe, else <IRI>."""
    out = F.concat(F.lit("<"), lex, F.lit(">"))
    # Build the CASE chain shortest-namespace-first: each later F.when
    # wraps the previous chain, so the LAST namespace added is evaluated
    # first at runtime — iterating shortest-first puts the longest
    # (tightest) namespace outermost, which is what nested prefixes
    # (ex:/exsub:) need to pick the tighter match.
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(lex, len(ns) + 1, 2_000_000_000)
        out = F.when(
            lex.startswith(ns) & local.rlike(_PN_LOCAL_RE),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(out)
    return out


def ttl_term(t: Column, prefixes: dict) -> Column:
    """Term struct → abbreviated Turtle token (bare numeric/boolean
    literals, prefixed names, N3 fallback)."""
    lex = t.getField("lex")
    dt = t.getField("dt")
    bare = (
        ((dt == T.XSD_INTEGER) & lex.rlike(_INT_RE))
        | ((dt == T.XSD_DECIMAL) & lex.rlike(_DEC_RE))
        | ((dt == T.XSD_DOUBLE) & lex.rlike(_DBL_RE))
        | ((dt == T.XSD_BOOLEAN) & lex.isin("true", "false"))
    )
    esc = _esc_literal(lex)
    return (
        F.when(t.getField("kind") == T.KIND_IRI, _ttl_iri(lex, prefixes))
        .when(t.getField("kind") == T.KIND_BNODE, F.concat(F.lit("_:"), lex))
        .when(bare, lex)
        .when(
            t.getField("lang").isNotNull(),
            F.concat(F.lit('"'), esc, F.lit('"@'), t.getField("lang")),
        )
        .when(
            dt.isNotNull() & (dt != T.XSD_STRING),
            F.concat(
                F.lit('"'), esc, F.lit('"^^'), _ttl_iri(dt, prefixes)
            ),
        )
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    )


def _with_xsd(prefixes: dict) -> dict:
    """Datatype positions almost always need xsd:; declare it unless
    the namespace is already bound under some prefix."""
    if T.XSD in prefixes.values() or "xsd" in prefixes:
        return prefixes
    return {**prefixes, "xsd": T.XSD}


def turtle_header(prefixes: dict) -> str:
    return "".join(
        f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(prefixes.items())
    )


def turtle_blocks(triples: DataFrame, prefixes: dict) -> DataFrame:
    """(st, pt, ot) → one-column DataFrame `value`, one subject block
    per row::

        ex:s a ex:T ;
            ex:p "v1", "v2" .

    Deterministic: objects sorted within a predicate, predicates sorted
    with rdf:type (`a`) first, blocks sortable by subject."""
    p_lex = F.col("pt").getField("lex")
    pred = F.when(p_lex == F.lit(RDF_TYPE), F.lit("a")).otherwise(
        ttl_term(F.col("pt"), prefixes)
    )
    po = (
        triples.select(
            ttl_term(F.col("st"), prefixes).alias("s"),
            pred.alias("p"),
            # rdf:type sorts before every other predicate
            F.when(p_lex == F.lit(RDF_TYPE), F.lit(" a")).otherwise(
                ttl_term(F.col("pt"), prefixes)
            ).alias("p_key"),
            ttl_term(F.col("ot"), prefixes).alias("o"),
        )
        .groupBy("s", "p", "p_key")
        .agg(F.array_join(F.array_sort(F.collect_set("o")), ", ").alias("os"))
    )
    return (
        po.groupBy("s")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("p_key"), F.col("p"), F.col("os")))
            ).alias("ps")
        )
        .select(
            F.concat(
                F.col("s"),
                F.lit(" "),
                F.array_join(
                    F.transform(
                        "ps", lambda x: F.concat(x["p"], F.lit(" "), x["os"])
                    ),
                    " ;\n    ",
                ),
                F.lit(" ."),
            ).alias("value")
        )
    )


def turtle_string(triples: DataFrame, prefixes: dict | None = None) -> str:
    """Full Turtle document as a driver-side string (header + blocks);
    for protocol responses and round-trip tests.  Human-sized results —
    use write_turtle for bulk dumps."""
    prefixes = _with_xsd(
        infer_prefixes(triples) if prefixes is None else prefixes
    )
    blocks = [
        r["value"]
        for r in turtle_blocks(triples, prefixes).orderBy("value").toLocalIterator()
    ]
    header = turtle_header(prefixes)
    return header + ("\n" if blocks else "") + "\n\n".join(blocks) + (
        "\n" if blocks else ""
    )


def write_turtle(
    triples: DataFrame, path: str, prefixes: dict | None = None
) -> None:
    """Distributed Turtle dump: subject blocks stream through the
    aggregation pipeline; every output partition file carries the
    @prefix header (each part is then a standalone Turtle document).
    Arrow-batched mapInPandas only prepends the header per partition —
    block assembly itself is pure column expressions."""
    import pandas as pd

    prefixes = _with_xsd(
        infer_prefixes(triples) if prefixes is None else prefixes
    )
    header = turtle_header(prefixes)

    def with_header(batches):
        yield pd.DataFrame({"value": [header]})
        yield from batches

    turtle_blocks(triples, prefixes).mapInPandas(
        with_header, "value string"
    ).write.mode("overwrite").text(path)


# ------------------------------------------------------ RDF/XML writer
#
# Reference: ``rio/rdfxml/BigdataRDFXMLWriter.java`` (Sesame's
# RDFXMLWriter under the Bigdata value factory).  Subject-grouped
# rdf:Description blocks with namespace-abbreviated property elements;
# driver-side serialization (protocol responses are human-sized — bulk
# dumps use the distributed N-Triples/Turtle writers).


def _xml_split(iri: str):
    """namespace/local split at the last NCName boundary."""
    import re as _re

    m = _re.search(r"[A-Za-z_][A-Za-z0-9_.-]*$", iri)
    if not m or m.start() == 0:
        return None
    return iri[: m.start()], iri[m.start():]


def rdfxml_string(triples: DataFrame) -> str:
    """(st, pt, ot) → RDF/XML document string, one rdf:Description per
    subject; property IRIs get xmlns-abbreviated (required by the
    grammar), bnodes use rdf:nodeID."""
    from xml.sax.saxutils import escape as esc
    from xml.sax.saxutils import quoteattr

    rows = triples.select("st", "pt", "ot").collect()
    ns_table: dict[str, str] = {T.RDF: "rdf"}
    by_subject: dict = {}
    for r in rows:
        key = (r["st"]["kind"], r["st"]["lex"])
        by_subject.setdefault(key, (r["st"], []))[1].append((r["pt"], r["ot"]))

    def prefix_for(ns: str) -> str:
        if ns not in ns_table:
            ns_table[ns] = f"ns{len(ns_table)}"
        return ns_table[ns]

    body = []
    for (_, _), (st, pos) in sorted(by_subject.items()):
        about = (
            f" rdf:about={quoteattr(st['lex'])}"
            if st["kind"] == T.KIND_IRI
            else f" rdf:nodeID={quoteattr(st['lex'])}"
        )
        lines = [f"  <rdf:Description{about}>"]
        for pt, ot in sorted(pos, key=lambda po: (po[0]["lex"], po[1]["lex"])):
            split = _xml_split(pt["lex"])
            if split is None:
                raise ValueError(
                    f"predicate IRI not XML-serializable: {pt['lex']}"
                )
            ns, local = split
            tag = f"{prefix_for(ns)}:{local}"
            if ot["kind"] == T.KIND_IRI:
                lines.append(
                    f"    <{tag} rdf:resource={quoteattr(ot['lex'])}/>"
                )
            elif ot["kind"] == T.KIND_BNODE:
                lines.append(f"    <{tag} rdf:nodeID={quoteattr(ot['lex'])}/>")
            elif ot["lang"]:
                lines.append(
                    f"    <{tag} xml:lang={quoteattr(ot['lang'])}>"
                    f"{esc(ot['lex'])}</{tag}>"
                )
            elif ot["dt"] and ot["dt"] != T.XSD_STRING:
                lines.append(
                    f"    <{tag} rdf:datatype={quoteattr(ot['dt'])}>"
                    f"{esc(ot['lex'])}</{tag}>"
                )
            else:
                lines.append(f"    <{tag}>{esc(ot['lex'])}</{tag}>")
        lines.append("  </rdf:Description>")
        body.append("\n".join(lines))
    xmlns = "".join(
        f'\n    xmlns:{p}={quoteattr(ns)}' for ns, p in sorted(ns_table.items(), key=lambda kv: kv[1])
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f"<rdf:RDF{xmlns}>\n" + "\n".join(body) + "\n</rdf:RDF>\n"
    )


# ------------------------------------------------------ JSON-LD writer


def jsonld_string(triples: DataFrame) -> str:
    """(st, pt, ot) → expanded-form JSON-LD (@id / @type keyed node
    objects in a top-level @graph array) — the shape our own reader and
    any conformant processor accepts."""
    import json as _json

    rows = triples.select("st", "pt", "ot").collect()
    nodes: dict = {}
    for r in rows:
        st, pt, ot = r["st"], r["pt"], r["ot"]
        sid = st["lex"] if st["kind"] == T.KIND_IRI else "_:" + st["lex"]
        node = nodes.setdefault(sid, {"@id": sid})
        if pt["lex"] == T.RDF + "type" and ot["kind"] == T.KIND_IRI:
            node.setdefault("@type", []).append(ot["lex"])
            continue
        if ot["kind"] == T.KIND_IRI:
            val = {"@id": ot["lex"]}
        elif ot["kind"] == T.KIND_BNODE:
            val = {"@id": "_:" + ot["lex"]}
        elif ot["lang"]:
            val = {"@value": ot["lex"], "@language": ot["lang"]}
        elif ot["dt"] and ot["dt"] != T.XSD_STRING:
            val = {"@value": ot["lex"], "@type": ot["dt"]}
        else:
            val = {"@value": ot["lex"]}
        node.setdefault(pt["lex"], []).append(val)
    return _json.dumps(
        {"@graph": [nodes[k] for k in sorted(nodes)]}, indent=1, sort_keys=True
    )
