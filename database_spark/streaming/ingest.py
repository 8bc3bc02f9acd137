"""Streaming triple ingest: N-Triples lines → term-struct triples.

Extension beyond the reference (which loads statically via RIO,
`DataLoader.java:90`): a `readStream.text` source parsed entirely with
SQL regexp expressions (no Python UDF in the hot path), append-merged
into a parquet-backed store via foreachBatch.  At scale this is the
"streaming lake ingest" shape: small batches append, compaction is the
table format's job.

Stateful extension: `running_user_counts` shows the
applyInPandasWithState pattern for custom operators Spark's built-ins
can't express (per-key running aggregates emitted every batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import terms as T

# N-Triples grammar (simplified: IRIs, bnodes, literals w/ lang or dt)
_S = r"(?:<([^>]*)>|(_:\S+))"
_P = r"<([^>]*)>"
_O = r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)"
NT_LINE = rf"^\s*{_S}\s+{_P}\s+{_O}\s*\.\s*$"


def _term(iri_g: int, bnode_g: int, lit_g: int | None = None,
          lang_g: int | None = None, dt_g: int | None = None):
    """Build a TERM struct column from regexp groups of NT_LINE."""
    line = F.col("value")

    def g(i):
        return F.regexp_extract(line, NT_LINE, i)

    iri, bnode = g(iri_g), g(bnode_g)
    out = (
        F.when(iri != "", T.term_struct(F.lit(T.KIND_IRI), iri, F.lit(None), F.lit(None)))
        .when(bnode != "", T.term_struct(F.lit(T.KIND_BNODE), bnode, F.lit(None), F.lit(None)))
    )
    if lit_g is not None:
        lit, lang, dt = g(lit_g), g(lang_g), g(dt_g)
        lex = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(lit, r'\\"', '"'), r"\\n", "\n"
            ),
            r"\\\\", "\\\\",
        )
        out = out.when(
            F.col("value").rlike(r'"'),
            T.term_struct(
                F.lit(T.KIND_LITERAL),
                lex,
                F.when(dt != "", dt)
                .when(lang != "", F.lit(T.RDF_LANGSTRING))
                .otherwise(F.lit(T.XSD_STRING)),
                F.when(lang != "", lang),
            ),
        )
    return out


def parse_nt_lines(lines: DataFrame) -> DataFrame:
    """DataFrame[value: string] → term-struct triples (st, pt, ot).
    Non-matching lines (comments, blanks) are dropped.  Pure column
    expressions — streams through codegen, no Python."""
    matched = lines.where(F.col("value").rlike(NT_LINE))
    return matched.select(
        _term(1, 2).alias("st"),
        T.term_struct(F.lit(T.KIND_IRI), F.regexp_extract(F.col("value"), NT_LINE, 3),
                      F.lit(None), F.lit(None)).alias("pt"),
        _term(4, 5, 6, 7, 8).alias("ot"),
    ).where(F.col("st").isNotNull() & F.col("ot").isNotNull())


def stream_nt_directory(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of .nt files → streaming triples."""
    lines = spark.readStream.format("text").load(path)
    return parse_nt_lines(lines)


def append_to_store(stream_triples: DataFrame, store_path: str, checkpoint: str):
    """foreachBatch appender: each micro-batch ids + appends.  Returns
    the StreamingQuery (caller awaits/stops)."""
    from ..store import _with_ids

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (_with_ids(batch_df)
         .write.mode("append").parquet(store_path))

    return (
        stream_triples.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def running_user_counts(events: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum, emitted on every update.

    This is the pattern for operators that windowed aggs can't express
    (running totals, custom eviction); state lives in the state store,
    partitioned by user_id.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
