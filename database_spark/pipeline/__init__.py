"""Training-data pipeline operators (dedup, similarity, text stats…).

Shared helper: ``spread_narrow`` — the expansion-aware parallelism
guard used by every per-row-heavy map stage in the package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan is narrower than the cluster.

    A small single-file parquet arrives as 1-2 splits, starving
    per-row-heavy map stages (tokenization, shingle hashing, LSH
    signatures) of parallelism — measured wins: dup_spans 16.2 → 5.4 s,
    corpus_funnel 23.2 → 12.8 s, lsh signature pass 10.1 → 1.3 s at
    sf1.  At 100 TB every scan is wider than the cluster, the guard is
    false, and the zero-shuffle claims in per-operator docstrings hold
    unchanged.  One definition so the guard condition can't drift
    between call sites.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
