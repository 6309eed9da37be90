"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every default here is chosen to
also hold on a multi-executor cluster: AQE for runtime re-planning
(coalesce + skew-join), UTC session time zone (oracle comparability),
Arrow for the pandas boundary, and shuffle partitions sized to the
available parallelism rather than the Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Parallelism knob: $SPARK_GRAFT_CPUS or the machine's CPU count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "locopy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parameters mirror what a cluster deployment would override via
    ``spark-submit``; in-process callers rarely need more than
    ``extra_conf``.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Wide codegen'd aggregates (16-32 agg exprs) across many
        # queries in one JVM overflow the default 240 MB JIT code
        # cache; when it fills, HotSpot disables compilation and
        # whole-stage-codegen'd operators run interpreted (10-25×
        # stalls that move between queries). Size it up and let the
        # sweeper reclaim cold compiled code.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    builder = builder.master(master or f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
