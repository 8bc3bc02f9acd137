"""SparkSession factory tuned for this engine.

The reference engine hand-manages vectored pipelines, off-heap hash
structures and spill (`bigdata-core/.../ChunkedRunningQuery.java`,
`HTree.java`).  On Spark all of that is Catalyst/Tungsten's job; what we
own is configuration: AQE on (runtime re-plan ~ the reference's RTO,
`JGraph.java:220`), adaptive coalescing + skew-join handling, and Arrow
for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "database-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    local[*] for tests; on a real cluster the same settings hold — AQE
    re-sizes shuffle partitions at runtime so `shuffle_partitions` is
    only the pre-AQE ceiling.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Python workers unpickle our Pandas-UDF closures by reference, so
    # the package root must be importable worker-side.  Local mode:
    # PYTHONPATH env propagates to forked workers.  Real cluster: ship
    # the package with --py-files/a wheel instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size post-shuffle partitions by BYTES, not core count (guide
        # §2.2/§9): with the default parallelismFirst=true AQE refuses
        # to coalesce below defaultParallelism, so every tiny shuffle
        # still runs ~numCores tasks and per-task overhead dominates
        # small reduce stages.  bytes-first + the advisory size keeps
        # partition sizing data-derived at every scale: a KB-size
        # aggregate coalesces to 1 task, a 100 TB shuffle still gets
        # bytes/advisory (hundreds of thousands of) partitions.  Both
        # knobs are env-overridable for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_BYTES", "67108864"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # spill-awareness: input split size bounds per-task memory at any
        # SF (default 128m; lower it for wide rows / fat structs)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # PySpark 4's DataFrame-context error enrichment wraps EVERY
        # DataFrame API call with a Python stack walk plus two py4j
        # round-trips (getActiveSession + a conf read) to record the
        # user call site for error messages.  Measured r12: ~280
        # wrapped calls per SPARQL compile at ~4.8 ms each — over half
        # the driver-side compile wall of every query.  Errors still
        # raise normally; they just omit the user-code line number.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
