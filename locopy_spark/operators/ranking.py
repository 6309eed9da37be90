"""Distributed global ranking.

Spark's ``Window.orderBy`` with no partition key moves the whole table
to ONE partition — a non-starter at scale. The classic fix: range
partition on the sort key, rank locally inside each (sorted) range,
then add each partition's global offset (prefix sum of partition
counts — P numbers through the driver, not rows). Total cost: one
range-partitioning sort shuffle + one tiny count job; every partition
ranks in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under ``order_cols`` (which must
    be a total order for a deterministic result)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # materialize ONCE: the ranged frame feeds both the counts job and
    # the ranking plan; repartitionByRange boundaries come from a
    # sample, so two independent computations could disagree on
    # partition assignment (wrong offsets)
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # P-row driver round-trip: partition counts → exclusive prefix sums
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact NTILE(n) from the distributed global rank (same SQL
    semantics: first ``n_rows % n`` tiles get the extra row)."""
    ranked = global_row_number(df, order_cols, out_col="__grn")
    total = ranked.count()
    base, rem = divmod(total, n)
    # rank r (1-based) → tile: the first `rem` tiles hold base+1 rows
    cut = rem * (base + 1)
    tile = F.when(
        F.col("__grn") <= cut,
        ((F.col("__grn") - 1) / (base + 1)).cast("bigint") + 1,
    ).otherwise(
        F.when(
            F.lit(base) > 0,
            ((F.col("__grn") - cut - 1) / base).cast("bigint") + rem + 1,
        ).otherwise(F.lit(None))
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop("__grn")
