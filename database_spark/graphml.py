"""GraphML ingest/export for the Blueprints veneer.

Reference: ``bigdata-blueprints/src/main/java/com/bigdata/blueprints/
webapp/BlueprintsServlet.java`` (POST a GraphML document → bulk load
through ``BigdataGraphBulkLoad``, reply ``<data modified=.../>``) and
the TinkerPop ``GraphMLReader``/``GraphMLWriter`` it delegates to.

Spark-first shape: the POSTed document is driver-sized by nature (it
arrived in one HTTP body), so parsing is a driver-side ``xml.etree``
pass, but the LOAD is the bulk path — one typed vertices DataFrame and
one edges DataFrame, each ingested column-wise by
``bulk_load_vertices`` / ``bulk_load_edges`` in one distributed engine
commit apiece, never element-at-a-time like the reference's
``GraphMLReader.inputGraph`` loop.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"
#: GraphML attr.type → Spark SQL type (TinkerPop's supported set)
_TYPES = {
    "string": "string",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
}
#: keyed by the SPARK type (what _TYPES maps to)
_PY_CAST = {
    "string": str,
    "boolean": lambda v: v.strip().lower() == "true",
    "int": int,
    "bigint": int,
    "float": float,
    "double": float,
}


def _tag(name: str) -> str:
    return f"{{{GRAPHML_NS}}}{name}"


def parse_graphml(text: str) -> tuple[list, list, dict]:
    """GraphML document → (node dicts, edge dicts, key schema).

    Returns ``(nodes, edges, keys)`` where ``keys`` maps property name
    → Spark type per element kind (``{"node": {...}, "edge": {...}}``);
    node dicts carry ``id`` + properties, edge dicts ``id``/``src``/
    ``dst``/``label`` + properties.  Accepts both TinkerPop label
    conventions: the ``label`` attribute on ``<edge>`` and a ``label``
    data key."""
    root = ET.fromstring(text)
    if root.tag not in (_tag("graphml"), "graphml"):
        raise ValueError(f"not a GraphML document (root {root.tag})")

    def find(el, name):
        got = el.findall(_tag(name))
        return got if got else el.findall(name)

    key_by_id: dict = {}
    keys = {"node": {}, "edge": {}}
    for k in find(root, "key"):
        kid = k.get("id")
        name = k.get("attr.name", kid)
        typ = _TYPES.get((k.get("attr.type") or "string").lower(), "string")
        for_ = k.get("for", "all")
        key_by_id[kid] = (name, typ)
        for kind in ("node", "edge") if for_ == "all" else (for_,):
            if kind in keys:
                keys[kind][name] = typ

    def datas(el, kind):
        out = {}
        for d in find(el, "data"):
            name, typ = key_by_id.get(d.get("key"), (d.get("key"), "string"))
            if d.text is None:
                continue
            out[name] = _PY_CAST[typ](d.text)
            keys[kind].setdefault(name, typ)
        return out

    nodes, edges = [], []
    for graph in find(root, "graph"):
        for n in find(graph, "node"):
            nodes.append({"id": n.get("id"), **datas(n, "node")})
        for i, e in enumerate(find(graph, "edge")):
            props = datas(e, "edge")
            label = e.get("label") or props.pop("label", None) or "edge"
            keys["edge"].pop("label", None)
            edges.append(
                {
                    "id": e.get("id") or f"e{i}",
                    "src": e.get("source"),
                    "dst": e.get("target"),
                    "label": label,
                    **props,
                }
            )
    return nodes, edges, keys


def load_graphml(graph, text: str) -> None:
    """Parse + bulk-load a GraphML document into a
    :class:`~database_spark.blueprints.PropertyGraph` — the engine half
    of the reference's ``BlueprintsServlet.doPost``."""
    nodes, edges, keys = parse_graphml(text)
    spark = graph.engine.store.spark
    if nodes:
        cols = ["id"] + sorted(keys["node"])
        schema = ", ".join(
            ["id string"] + [f"`{c}` {keys['node'][c]}" for c in sorted(keys["node"])]
        )
        rows = [tuple(n.get(c) for c in cols) for n in nodes]
        graph.bulk_load_vertices(spark.createDataFrame(rows, schema))
    if edges:
        props = sorted(keys["edge"])
        cols = ["id", "src", "dst", "label"] + props
        schema = ", ".join(
            ["id string", "src string", "dst string", "label string"]
            + [f"`{c}` {keys['edge'][c]}" for c in props]
        )
        rows = [tuple(e.get(c) for c in cols) for e in edges]
        graph.bulk_load_edges(spark.createDataFrame(rows, schema))


def graphml_string(graph) -> str:
    """Export the property graph as GraphML (TinkerPop
    ``GraphMLWriter`` shape).  A full export is inherently a full
    materialization — the same contract as the reference writer; the
    element streams come from the relational ``vertices_df``/
    ``edges_df`` scale paths via ``toLocalIterator``."""
    def pytype(v):
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        return "string"

    def lex(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    vkeys: dict = {}
    ekeys: dict = {}
    vitems, eitems = [], []
    for r in graph.vertices_df().toLocalIterator():
        v = graph.get_vertex(r["id"])
        props = {}
        for k in v.get_property_keys():
            val = v.get_property(k)
            props[k] = val
            vkeys.setdefault(k, pytype(val))
        vitems.append((r["id"], props))
    for r in graph.edges_df().toLocalIterator():
        e = graph.get_edge(r["id"])
        props = {}
        for k in e.get_property_keys():
            val = e.get_property(k)
            props[k] = val
            ekeys.setdefault(k, pytype(val))
        eitems.append((r["id"], r["out"], r["in"], r["label"], props))

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<graphml xmlns="{GRAPHML_NS}">',
    ]
    for k, t in sorted(vkeys.items()):
        out.append(
            f'<key id={quoteattr("v_" + k)} for="node" '
            f'attr.name={quoteattr(k)} attr.type="{t}"/>'
        )
    for k, t in sorted(ekeys.items()):
        out.append(
            f'<key id={quoteattr("e_" + k)} for="edge" '
            f'attr.name={quoteattr(k)} attr.type="{t}"/>'
        )
    out.append('<graph id="G" edgedefault="directed">')
    for vid, props in sorted(vitems):
        if props:
            out.append(f"<node id={quoteattr(str(vid))}>")
            for k, v in sorted(props.items()):
                out.append(
                    f'<data key={quoteattr("v_" + k)}>{escape(lex(v))}</data>'
                )
            out.append("</node>")
        else:
            out.append(f"<node id={quoteattr(str(vid))}/>")
    for eid, src, dst, label, props in sorted(eitems):
        attrs = (
            f"id={quoteattr(str(eid))} source={quoteattr(str(src))} "
            f"target={quoteattr(str(dst))} label={quoteattr(label or 'edge')}"
        )
        if props:
            out.append(f"<edge {attrs}>")
            for k, v in sorted(props.items()):
                out.append(
                    f'<data key={quoteattr("e_" + k)}>{escape(lex(v))}</data>'
                )
            out.append("</edge>")
        else:
            out.append(f"<edge {attrs}/>")
    out += ["</graph>", "</graphml>"]
    return "\n".join(out)
