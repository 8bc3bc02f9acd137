"""Skew-aware join helpers.

RDF graphs are power-law skewed: hub nodes (rdf:type objects, popular
entities) concentrate a join key onto one reducer.  AQE's skew-join
splitting (`spark.sql.adaptive.skewJoin`) handles the shuffle-join
case automatically; this module provides the explicit tool for when a
key is SO hot that even split partitions thrash: salting.

``salted_join(big, small, key, salt)`` replicates the small side
`salt` ways and sprays the big side uniformly — turning one hot
partition into `salt` even ones.  Correct for inner/left joins on an
equi-key.  Use when a profile (``key_histogram``) shows a key holding
>~1/parallelism of all rows; otherwise let AQE do it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Per-key row counts + share of total — the skew profile."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(max(total, 1)))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big.key` is heavily skewed.

    big gets a uniform random salt in [0, salt); small is replicated
    across all salt values (explode — small side only, so the blowup is
    bounded by |small| * salt).  The join key becomes (key, salt) and
    no single reducer sees a whole hot key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    b = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
