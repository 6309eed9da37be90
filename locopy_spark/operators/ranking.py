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
    _return_total: bool = False,
):
    """Exact 1-based global row number under ``order_cols`` (which must
    be a total order for a deterministic result).

    ``_return_total=True`` additionally returns the total row count —
    already known from the partition-count round-trip, so callers that
    need it (``global_ntile``) don't replay the rank plan to count."""
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
    out = (
        ranged.join(off_df, "__pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    return (out, acc) if _return_total else out


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact NTILE(n) from the distributed global rank (same SQL
    semantics: first ``n_rows % n`` tiles get the extra row)."""
    ranked, total = global_row_number(
        df, order_cols, out_col="__grn", _return_total=True
    )
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


def grouped_global_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "rn",
    size_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based row number *within each group* under ``order_cols``
    — without ``Window.partitionBy(group)``'s one-task-per-group sort.

    Built for the few-groups/many-rows regime (order priorities,
    languages, market segments …) where a partitioned window serializes:
    range-partition on (group, order) so every partition holds a
    contiguous slice of one-or-more groups' sort order, rank locally,
    then add per-(partition, group) offsets (≤ P + G - 1 numbers through
    the driver — the ranges overlap at most G-1 group boundaries).
    ``size_col`` additionally attaches the group's total row count
    (broadcast G-row join), enabling percent_rank/cume_dist arithmetic.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(parts, *keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    cnt_rows = (
        ranged.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    per_group: dict[tuple, list] = {}
    for r in cnt_rows:
        per_group.setdefault(tuple(r[g] for g in group_cols), []).append(
            (r["__pid"], r["cnt"])
        )
    off_rows, size_rows = [], []
    for gk, lst in per_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            off_rows.append((*gk, pid, acc))
            acc += cnt
        size_rows.append((*gk, acc))
    spark = df.sparkSession
    # off_rows tuples are in group_cols order — the schema must match it,
    # not df.schema order (they differ when the caller reorders keys)
    gfields = [df.schema[c] for c in group_cols]
    from pyspark.sql import types as T

    off_schema = T.StructType(
        gfields
        + [T.StructField("__pid", T.IntegerType()), T.StructField("__off", T.LongType())]
    )
    off_df = F.broadcast(spark.createDataFrame(off_rows, off_schema))
    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    out = (
        ranged.join(off_df, ["__pid", *group_cols])
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    if size_col:
        size_schema = T.StructType(
            gfields + [T.StructField(size_col, T.LongType())]
        )
        out = out.join(
            F.broadcast(spark.createDataFrame(size_rows, size_schema)), group_cols
        )
    return out


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact exclusive prefix sum of ``value_col`` under the global
    order ``order_cols`` (a total order), without a one-partition
    window.

    Same shape as :func:`global_row_number`: range-partition on the
    order, one tiny driver round-trip of per-partition SUMS → exclusive
    offsets, then a per-partition running sum plus the offset. Powers
    order-dependent assignment at scale — sequence packing, quota
    fills, cumulative budgets.  ``out_col`` excludes the current row
    (sum of everything strictly before it).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums_df = ranged.groupBy("__pid").agg(F.sum(value_col).alias("s"))
    sum_type = sums_df.schema["s"].dataType  # long/double/decimal per input
    sums = {r["__pid"]: r["s"] for r in sums_df.collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    from pyspark.sql import types as T

    off_schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__off", sum_type),
        ]
    )
    if isinstance(sum_type, T.DoubleType):
        coerce = float
    elif isinstance(sum_type, T.DecimalType):
        from decimal import Decimal

        coerce = Decimal
    else:
        coerce = int
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, coerce(off)) for pid, off in offsets.items()], off_schema
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(off_df, "__pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w), F.lit(0)) + F.col("__off"),
        )
        .drop("__pid", "__off")
    )


def grouped_global_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    weight_col: str,
    out_col: str = "cumw",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``weight_col`` *within each
    group* under ``order_cols`` — :func:`grouped_global_row_number`
    for weights instead of row counts, and the grouped form of
    :func:`global_running_sum`.

    Same shape: range-partition on (group, order) so every partition
    holds a contiguous slice of one-or-more groups' order, one driver
    round-trip of per-(partition, group) weight sums (≤ P + G - 1
    bigints) → exclusive offsets, then a per-partition running sum
    plus the offset. ``total_col`` attaches each group's total weight
    (broadcast G-row join) — together they power weighted quantiles /
    cumulative-share arithmetic without a one-task-per-group window.
    Weights must be bigint (exactness contract).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(parts, *keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sum_rows = (
        ranged.groupBy("__pid", *group_cols)
        .agg(F.sum(weight_col).alias("s"))
        .collect()
    )
    per_group: dict[tuple, list] = {}
    for r in sum_rows:
        per_group.setdefault(tuple(r[g] for g in group_cols), []).append(
            (r["__pid"], r["s"] or 0)
        )
    off_rows, tot_rows = [], []
    for gk, lst in per_group.items():
        acc = 0
        for pid, s in sorted(lst):
            off_rows.append((*gk, pid, acc))
            acc += s
        tot_rows.append((*gk, acc))
    spark = df.sparkSession
    from pyspark.sql import types as T

    gfields = [df.schema[c] for c in group_cols]
    off_schema = T.StructType(
        gfields
        + [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__off", T.LongType()),
        ]
    )
    off_df = F.broadcast(spark.createDataFrame(off_rows, off_schema))
    w = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.join(off_df, ["__pid", *group_cols])
        .withColumn(out_col, F.sum(weight_col).over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    if total_col:
        tot_schema = T.StructType(
            gfields + [T.StructField(total_col, T.LongType())]
        )
        out = out.join(
            F.broadcast(spark.createDataFrame(tot_rows, tot_schema)),
            group_cols,
        )
    return out


def global_rank_and_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    rank_col: str = "rn",
    sum_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`global_row_number` AND :func:`global_running_sum` from
    ONE range-partitioned pass: a single ranged materialization, one
    P-row driver round-trip carrying (count, sum) per partition, then
    both local windows add their offsets.  Callers that need the rank
    and the exclusive prefix sum together (change-point scans, Lorenz
    tails) pay one shuffle instead of two."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per = {
        r["__pid"]: (r["cnt"], r["s"] or 0)
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc_n, acc_s = {}, 0, 0
    for pid in sorted(per):
        offsets[pid] = (acc_n, acc_s)
        acc_n += per[pid][0]
        acc_s += per[pid][1]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, n, int(s)) for pid, (n, s) in offsets.items()],
            "__pid int, __offn long, __offs long",
        )
    )
    wr = Window.partitionBy("__pid").orderBy(*order_cols)
    ws = wr.rowsBetween(Window.unboundedPreceding, -1)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(rank_col, F.row_number().over(wr) + F.col("__offn"))
        .withColumn(
            sum_col,
            F.coalesce(F.sum(value_col).over(ws), F.lit(0))
            + F.col("__offs"),
        )
        .drop("__pid", "__offn", "__offs")
    )
