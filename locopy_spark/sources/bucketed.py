"""Bucketed managed tables: co-located, shuffle-free joins.

The 100 TB join strategy the brief calls out: when two fact tables are
bucketed by the same key into the same bucket count, Spark reads them
already co-partitioned and the join plans with ZERO exchanges — the
shuffle is paid once at write time and amortized over every subsequent
join. ``tests/test_plans.py::test_bucketed_join_has_no_shuffle``
asserts the exchange-free plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally
    sorted) by ``bucket_col`` — sorted buckets additionally enable
    merge joins with no sort step.

    Idempotent across sessions: a managed-table LOCATION left behind
    by a previous session (directory on disk, table absent from this
    session's catalog) would fail ``saveAsTable`` with
    LOCATION_ALREADY_EXISTS, so the stale table AND any stray
    directory are removed first."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path
        stray = os.path.join(warehouse, table.lower())
        if warehouse and os.path.isdir(stray):
            shutil.rmtree(stray, ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with no Exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
