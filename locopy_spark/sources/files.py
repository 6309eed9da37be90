"""File shaping, Spark-first.

Parity target: reference locopy/utility.py:82-225 (compress / split /
concatenate). The reference shapes files byte-by-byte on one machine;
on a cluster file shape is a property of the WRITE:

- split      → ``repartition(n)`` before writing (n output files)
- compress   → ``option("compression", codec)``
- concatenate→ ``coalesce(1)`` (one output file, no driver copy)

The local helpers in ``locopy_spark.utility`` remain for byte-level
parity on local paths.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def write_split(
    df: DataFrame,
    path: str,
    splits: int,
    file_format: str = "csv",
    compression: str | None = None,
    header: bool = False,
    delim: str = "|",
    mode: str = "overwrite",
) -> list[str]:
    """Write ``df`` as exactly ``splits`` files (cluster-side split)."""
    out = df.coalesce(splits) if splits == 1 else df.repartition(splits)
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    fmt = file_format.lower()
    if fmt == "csv":
        writer.options(sep=delim, header=header).csv(path)
        pattern = "part-*"
    elif fmt == "json":
        writer.json(path)
        pattern = "part-*"
    elif fmt == "parquet":
        writer.parquet(path)
        pattern = "part-*.parquet"
    else:
        raise ValueError(f"unsupported file_format: {file_format}")
    return sorted(glob.glob(os.path.join(path, pattern)))


def write_single(
    df: DataFrame,
    path: str,
    file_format: str = "csv",
    compression: str | None = None,
    header: bool = False,
    delim: str = "|",
    mode: str = "overwrite",
) -> list[str]:
    """Write one output file (the reference's concatenate use-case)."""
    return write_split(
        df, path, 1, file_format, compression, header, delim, mode
    )
