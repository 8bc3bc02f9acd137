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
    esc = lex.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
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


def n3_col(t: Column) -> Column:
    """Term struct → its N3 lexical form, as a pure column expression
    (stays in codegen for arbitrarily large dumps)."""
    lex = t.getField("lex")
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(lex, r"\\", r"\\\\"), '"', '\\\\"'
        ),
        "\n",
        r"\\n",
    )
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
