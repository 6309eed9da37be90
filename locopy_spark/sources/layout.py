"""Multi-dimensional data layout: z-order (Morton) clustered writes.

The 100 TB problem this solves: parquet min/max pruning only skips row
groups when the data is CLUSTERED on the filter column. Sorting by
(a, b) clusters a perfectly and b not at all — a filter on b alone
still scans everything. Interleaving the bits of both keys (the
Z-/Morton curve) makes every output file a small hyper-rectangle in
(a, b) space, so selective filters on EITHER column prune most files.
Delta/Iceberg expose this as ``OPTIMIZE ... ZORDER BY``; this is the
same layout computed with plain Catalyst expressions (bit shifts and
ors — no UDF) plus ``repartitionByRange`` on the z-value, so it works
on any parquet sink.

Key normalization is min-max scaling to ``bits``-bit integers from
bounds supplied by the caller (at scale: yesterday's profile row —
see ``queries.stats.q_profile_tables``) or computed with one tiny
min/max aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _scaled(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to [0, 2^bits) as a long.

    NULL key values land in bucket 0 (greatest/least skip NULL
    arguments), co-located with the genuine minimum — acceptable for a
    layout key, but filter NULLs first if they are a large fraction
    (they would skew one output file and dull pruning on the other
    dimension)."""
    span = hi - lo
    unit = (F.col(col).cast("double") - lo) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
    return F.least(
        F.floor(clamped * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def zorder_value(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of two ``bits``-bit longs (x even positions,
    y odd) as one Catalyst expression — whole-stage-codegen friendly,
    no Python in the row path."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1)
        )
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def with_zorder(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = DEFAULT_BITS,
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Attach a ``__z`` Morton key over two numeric columns.

    ``bounds`` = (min_x, max_x, min_y, max_y); when omitted, one tiny
    min/max aggregate computes them (a second scan — at 100 TB pass
    the profile's bounds instead).
    """
    if bounds is None:
        row = df.agg(
            F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
        ).first()
        bounds = (float(row[0]), float(row[1]), float(row[2]), float(row[3]))
    lo_x, hi_x, lo_y, hi_y = (F.lit(float(b)) for b in bounds)
    return df.withColumn(
        "__z",
        zorder_value(
            _scaled(col_x, lo_x, hi_x, bits),
            _scaled(col_y, lo_y, hi_y, bits),
            bits,
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    bounds: tuple[float, float, float, float] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of
    (``col_x``, ``col_y``): range-partition on the Morton key into
    ``n_files`` write tasks, sort within partitions, drop the key.

    Each output file covers a compact rectangle of the key space, so
    parquet footer min/max statistics prune files for selective
    filters on either column.
    """
    z = with_zorder(df, col_x, col_y, bits=bits, bounds=bounds)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Compact a small-file parquet directory into ~``target_mb``
    files — the OPTIMIZE/compaction maintenance job every streaming
    sink needs (each micro-batch writes a file; a day of 1-minute
    batches is 1440 tiny files whose open/footer overhead dominates
    scans at 100 TB).

    Sizes the output from the CURRENT on-disk bytes (no sampling),
    optionally re-sorts on ``sort_col`` to restore clustering, writes
    to a staging directory, then swaps it in with two ``os.rename``
    calls. The swap is crash-RECOVERABLE, not atomic (no portable
    atomic directory replace exists outside a table format): each
    rename is atomic, stale ``.__compact_tmp``/``.__compact_old``
    leftovers from a crashed prior run are cleared up front, and a
    crash between the two renames leaves the complete old data intact
    at ``.__compact_old`` (recover by renaming it back). On a real
    deployment this job runs under a table format's transactional
    commit instead. Returns the output file count.
    """
    import math
    import os
    import shutil

    staging = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    # clear leftovers from a crashed prior run: a pre-existing `old`
    # directory would otherwise swallow the rename (move-into-dir)
    for leftover in (staging, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_col is not None:
        df = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return sum(
        1
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
