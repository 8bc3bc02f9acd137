"""Vendor utility SERVICEs: bd:values, bd:slice, bd:sample.

Reference: ``RDF/rdf/sparql/ast/eval/ValuesServiceFactory.java``,
``SliceServiceFactory.java``, ``SampleServiceFactory.java`` — magic
services under the ``http://www.bigdata.com/rdf#`` namespace that
simulate VALUES, slice an access path, and sample an access path.

Spark design notes:
* the reference's slice/sample ride the B+Tree key order / SampleIndex
  for free; here the deterministic analog is a sort by the pattern's
  term-id columns (SPO key-order analog) before the slice, and a
  seeded-hash order for RANDOM samples — both reproducible across
  runs, both plain Catalyst sorts that AQE sizes.
* everything stays a DataFrame; limits/offsets are plan nodes, no
  driver materialization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import terms as T
from . import ast as A
from .compiler import Sol, SparqlCompileError

BD_NS = "http://www.bigdata.com/rdf#"
SERVICE_PARAM = BD_NS + "serviceParam"


def _split_group(sp, key: str):
    """Group elements → (data triple patterns, {param: [objects]})."""
    params: dict[str, list] = {}
    data = []
    for el in sp.group.elements:
        if not isinstance(el, A.TriplePattern):
            raise SparqlCompileError(f"{key}: only triple patterns allowed")
        if (
            isinstance(el.s, A.Const)
            and el.s.term.lex == SERVICE_PARAM
            and isinstance(el.p, A.Const)
        ):
            name = el.p.term.lex.rsplit(".", 1)[-1]
            params.setdefault(name, []).append(el.o)
        else:
            data.append(el)
    return data, params


def _int_param(params: dict, name: str, default=None) -> int | None:
    if name not in params:
        return default
    o = params[name][0]
    if not isinstance(o, A.Const):
        raise SparqlCompileError(f"bd param {name} must be a constant")
    return int(o.term.lex)


def _ordered_pattern_sol(compiler, data, graph, key: str) -> Sol:
    if len(data) != 1:
        raise SparqlCompileError(f"{key}: exactly one triple pattern required")
    sol = compiler.scan_pattern(data[0], graph)
    order = [F.col(v + "__id").asc_nulls_first() for v in sorted(sol.vars)]
    return Sol(sol.df.orderBy(*order) if order else sol.df, sol.vars, sol.maybe_unbound)


def make_bd_utility_services():
    def values_handler(compiler, sp, graph):
        """SERVICE bd:values { bd:serviceParam bd:values.var ?v .
        bd:serviceParam bd:values.val "x" . ... } — binds ?v to each
        val (ValuesServiceFactory)."""
        _data, params = _split_group(sp, "bd:values")
        if "var" not in params or "val" not in params:
            raise SparqlCompileError("bd:values requires bd:values.var and bd:values.val")
        var = params["var"][0]
        if not isinstance(var, A.Var):
            raise SparqlCompileError("bd:values.var must be a variable")
        vals = []
        for o in params["val"]:
            if not isinstance(o, A.Const):
                raise SparqlCompileError("bd:values.val must be constants")
            vals.append((o.term,))
        df = T.terms_df(compiler.spark, vals, [var.name])
        df = df.withColumn(var.name + "__id", T.term_id(F.col(var.name)))
        return Sol(df, {var.name}, set())

    def slice_handler(compiler, sp, graph):
        """SERVICE bd:slice { <pattern> . bd:serviceParam bd:slice.offset O .
        bd:serviceParam bd:slice.limit L } — a deterministic slice of
        the access path in term-id (key) order; with bd:slice.range ?r
        it returns the pattern's range count instead
        (SliceServiceFactory)."""
        data, params = _split_group(sp, "bd:slice")
        if "range" in params:
            rv = params["range"][0]
            if not isinstance(rv, A.Var):
                raise SparqlCompileError("bd:slice.range must be a variable")
            if len(data) != 1:
                raise SparqlCompileError("bd:slice: exactly one triple pattern required")
            sol = compiler.scan_pattern(data[0], graph)
            cnt = sol.df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
            from .functions import pack_integer

            term = pack_integer(F.col("__n"))
            df = cnt.select(
                term.alias(rv.name), T.term_id(term).alias(rv.name + "__id")
            )
            return Sol(df, {rv.name}, set())
        sol = _ordered_pattern_sol(compiler, data, graph, "bd:slice")
        offset = _int_param(params, "offset", 0)
        limit = _int_param(params, "limit", None)
        df = sol.df
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        return Sol(df, sol.vars, sol.maybe_unbound)

    def sample_handler(compiler, sp, graph):
        """SERVICE bd:sample { <pattern> . bd:serviceParam
        bd:sample.limit N . bd:sample.seed S . bd:sample.sampleType
        "RANDOM"|"DENSE" } — seeded reproducible sample of the access
        path (SampleServiceFactory / SampleIndex).  RANDOM orders by a
        seeded hash of the tuple; DENSE takes the first N in key
        order."""
        data, params = _split_group(sp, "bd:sample")
        limit = _int_param(params, "limit", 100)
        seed = _int_param(params, "seed", 0)
        stype = "RANDOM"
        if "sampleType" in params and isinstance(params["sampleType"][0], A.Const):
            stype = params["sampleType"][0].term.lex.upper()
        sol = _ordered_pattern_sol(compiler, data, graph, "bd:sample")
        df = sol.df
        if stype != "DENSE":  # RANDOM (and EVEN approximated by hash order)
            ids = [F.col(v + "__id") for v in sorted(sol.vars)]
            df = df.orderBy(F.xxhash64(F.lit(seed), *ids).asc())
        return Sol(df.limit(limit), sol.vars, sol.maybe_unbound)

    return {
        BD_NS + "values": values_handler,
        BD_NS + "slice": slice_handler,
        BD_NS + "sample": sample_handler,
    }
