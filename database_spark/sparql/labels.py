"""Wikibase label SERVICE — auto-bound entity labels.

Reference: the reference ships Wikidata's label service resolution in
its WDQS deployment profile (``SERVICE wikibase:label { bd:serviceParam
wikibase:language "en" }``; exercised by ``ticket_bg1817``): for every
projected variable ``?xLabel`` whose base variable ``?x`` is bound by
the query, the service binds the entity's ``rdfs:label`` in the first
matching preferred language, falling back to the term's local name.

Spark design: unlike ordinary services (independent solution sets that
JOIN in), the label service TRANSFORMS the current solution — one
broadcast-friendly left join per label variable against the store's
``rdfs:label`` frame, with a language-priority ``min_by`` pick.  The
handler is flagged ``transforms_sol`` so the group compiler routes the
running solution through it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import terms as T
from . import ast as A

WIKIBASE_NS = "http://wikiba.se/ontology#"
RDFS_LABEL = T.RDFS + "label"


def make_label_service() -> dict:
    def handler(compiler, sp: A.ServicePattern, graph, sol):
        from .compiler import Sol

        # language preference list: bd:serviceParam wikibase:language
        # "en,fr"; [AUTO_LANGUAGE] resolves to "en" (no request locale)
        langs: list[str] = []
        for el in sp.group.elements:
            if (
                isinstance(el, A.TriplePattern)
                and isinstance(el.p, A.Const)
                and el.p.term.lex == WIKIBASE_NS + "language"
                and isinstance(el.o, A.Const)
            ):
                for part in el.o.term.lex.split(","):
                    part = part.strip()
                    langs.append("en" if part == "[AUTO_LANGUAGE]" else part)
        if not langs:
            langs = ["en"]

        wanted = getattr(compiler, "projection_var_names", set())
        pairs = [
            (v, v + "Label")
            for v in sorted(sol.vars)
            if v + "Label" in wanted and v + "Label" not in sol.vars
        ]
        if not pairs:
            return sol

        # best label per subject: language-priority min_by over the
        # rdfs:label frame (small relative to data; broadcastable)
        label_id = T.term_id(T.lit_term(T.Term.iri(RDFS_LABEL)))
        lab = compiler.triples.where(F.col("p") == label_id)
        prio = F.lit(None).cast("int")
        for i, lg in enumerate(reversed(langs)):
            prio = F.when(
                F.col("ot").getField("lang") == lg.lower(),
                F.lit(len(langs) - 1 - i),
            ).otherwise(prio)
        best = (
            lab.select(F.col("s").alias("__ls"), F.col("ot").alias("__lt"), prio.alias("__lp"))
            .where(F.col("__lp").isNotNull())
            .groupBy("__ls")
            .agg(F.min_by("__lt", "__lp").alias("__lt"))
        )
        df = sol.df
        new_vars = set(sol.vars)
        mu = set(sol.maybe_unbound)
        for v, lv in pairs:
            # No explicit broadcast hint: the rdfs:label aggregate is
            # unbounded on a label-heavy store, so forcing a broadcast
            # risks driver/executor OOM at scale.  AQE picks broadcast
            # automatically when the aggregate is actually small.
            df = df.join(
                best,
                df[v + "__id"] == best["__ls"],
                "left_outer",
            )
            # fallback: plain literal of the term's local name (the
            # WDQS behavior for label-less entities)
            base = F.col(v)
            local = F.element_at(
                F.split(base.getField("lex"), "[/#]"), -1
            )
            label_term = F.coalesce(
                F.col("__lt"),
                F.when(
                    base.isNotNull(),
                    T.term_struct(
                        F.lit(T.KIND_LITERAL), local, F.lit(T.XSD_STRING), F.lit(None)
                    ),
                ),
            )
            df = (
                df.withColumn(lv, label_term)
                .withColumn(
                    lv + "__id",
                    F.when(F.col(lv).isNotNull(), T.term_id(F.col(lv))),
                )
                .drop("__ls", "__lt")
            )
            new_vars.add(lv)
            if v in mu:
                mu.add(lv)
        return Sol(df, new_vars, mu)

    handler.transforms_sol = True
    return {WIKIBASE_NS + "label": handler}
