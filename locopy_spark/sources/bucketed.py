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
    directory are removed first.  When the table already exists in
    the catalog its REAL location is resolved from ``DESCRIBE TABLE
    EXTENDED`` (the warehouse-path heuristic below only covers the
    table-absent case, and is qualified-name/current-database aware).
    Read-your-own-overwrite is safe: on overwrite of an existing
    table the input is materialized via ``localCheckpoint`` (blocks
    stored, file lineage dropped) BEFORE the old data is deleted —
    otherwise a df derived from ``table`` would lazily re-read the
    files the drop just removed (ADVICE r7)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    if mode == "overwrite":
        exists = spark.catalog.tableExists(table)
        location = None
        if exists:
            loc_rows = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
                .filter("col_name = 'Location'")
                .collect()
            )
            if loc_rows:
                location = urlparse(loc_rows[0]["data_type"]).path
            # the input may derive from the table being overwritten:
            # pin its blocks before dropping the old files
            df = df.localCheckpoint(eager=True)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if location and os.path.isdir(location):
            shutil.rmtree(location, ignore_errors=True)
        else:
            clear_stale_location(spark, table)
    # n_buckets=0: plain managed table (no bucket spec) — for tiny /
    # complex-typed artifacts (a 1-row codebook) that still want the
    # stale-location cleanup above
    if n_buckets:
        writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
    else:
        writer = df.write.mode(mode)
    writer.saveAsTable(table)


def clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove a CATALOG-ABSENT managed-table directory left behind by
    a previous session (the in-memory catalog forgets tables on exit;
    their warehouse directories persist).  Both ``saveAsTable`` and
    ``ALTER TABLE ... RENAME TO`` fail with LOCATION_ALREADY_EXISTS on
    such residue, so every path that creates or renames INTO a managed
    name clears it first.  No-op when the table exists in the catalog
    (a live table's location is owned by the catalog, not stale)."""
    import shutil
    from urllib.parse import urlparse

    if spark.catalog.tableExists(table):
        return
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if not warehouse:
        return
    if "." in table:
        db, tbl = table.rsplit(".", 1)
    else:
        db, tbl = spark.catalog.currentDatabase(), table
    sub = (
        tbl.lower()
        if db == "default"
        else os.path.join(f"{db.lower()}.db", tbl.lower())
    )
    location = os.path.join(warehouse, sub)
    if os.path.isdir(location):
        shutil.rmtree(location, ignore_errors=True)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with no Exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def swap_staging_tables(
    spark: SparkSession,
    staging: dict[str, str],
    serving: dict[str, str],
    old: dict[str, str],
) -> None:
    """Catalog-rename a set of staging tables over their serving names
    — the compact_parquet staging-write + rename-swap device lifted to
    managed tables, shared by the ANN and lexical index refresh arms
    (operators/ann_index.py, queries/docs_ext.refresh_lexical_index).

    Crash-RECOVERABLE, not atomic (no portable multi-table atomic
    commit exists outside a table format): each single-table ``ALTER
    TABLE RENAME`` is atomic, and **re-running this function is the
    universal recovery action** — every key is handled by its
    observable state, so a crash at ANY point leaves a state a re-run
    completes:

    - staging present → normal swap for that key (current serving, if
      any, rotates through its ``old`` name and is dropped after);
    - staging absent, serving present → that key already swapped by a
      prior run: no-op;
    - staging absent, serving absent, old present → the prior run
      died between its two renames: roll the old table back into
      service (the staged copy for that key is gone; a subsequent
      rebuild re-creates it).

    On a real deployment this commit runs under a table format's
    transaction instead.  Readers resolve serving names at call time,
    so a reader mid-build sees the complete old index and a reader
    post-swap the complete new one.
    """
    for key in staging:
        st, sv, ol = staging[key], serving[key], old[key]
        if spark.catalog.tableExists(st):
            if spark.catalog.tableExists(sv):
                spark.sql(f"DROP TABLE IF EXISTS {ol}")
                clear_stale_location(spark, ol)  # dead-session residue
                spark.sql(f"ALTER TABLE {sv} RENAME TO {ol}")
            else:
                clear_stale_location(spark, sv)
            spark.sql(f"ALTER TABLE {st} RENAME TO {sv}")
            spark.sql(f"DROP TABLE IF EXISTS {ol}")
        elif spark.catalog.tableExists(sv):
            # already swapped by a prior (crashed) run — drop its
            # leftover old copy so the device leaves no residue
            spark.sql(f"DROP TABLE IF EXISTS {ol}")
        elif spark.catalog.tableExists(ol):
            clear_stale_location(spark, sv)
            spark.sql(f"ALTER TABLE {ol} RENAME TO {sv}")
