"""UNLOAD — export a query's results to files.

Parity target: reference locopy/redshift.py:349-531
(``unload``/``unload_and_copy``) and locopy/snowflake.py:339-410. The
reference UNLOADs to S3 (optionally ``PARALLEL OFF``, ``HEADER``,
gzip) then downloads + concatenates locally. Spark-first: the write IS
parallel — ``splits`` maps to output partitions (``repartition``),
``PARALLEL OFF`` to ``coalesce(1)``, gzip to the codec option, and the
"download + reassemble" step is only a local convenience
(``unload_and_fetch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from locopy_spark.errors import DBError


def unload(
    spark: SparkSession,
    query: str,
    path: str,
    file_format: str = "csv",
    delim: str = "|",
    header: bool = False,
    compression: str | None = None,
    splits: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Run ``query`` and write the result under ``path``.

    ``splits=None`` keeps the plan's natural partitioning (cluster
    decides); an int forces that many output files; ``partition_by``
    produces hive-style directory partitioning for pruning on re-read.
    """
    try:
        df = spark.sql(query)
        out = df
        if splits is not None:
            out = df.coalesce(splits) if splits == 1 else df.repartition(splits)
        writer = out.write.mode(mode)
        if compression:
            writer = writer.option("compression", compression)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        fmt = file_format.lower()
        if fmt == "csv":
            writer.options(sep=delim, header=header).csv(path)
        elif fmt == "json":
            writer.json(path)
        elif fmt == "parquet":
            writer.parquet(path)
        elif fmt == "orc":
            writer.orc(path)
        else:
            raise ValueError(f"unsupported file_format: {file_format}")
        return df
    except Exception as e:
        raise DBError(f"Error unloading query to {path}.") from e


def unload_and_fetch(
    spark: SparkSession,
    query: str,
    path: str | None = None,
    **unload_kwargs,
):
    """UNLOAD and also return the result as a pandas DataFrame
    (reference ``unload_and_copy`` semantics: export + local copy)."""
    if path is not None:
        df = unload(spark, query, path, **unload_kwargs)
    else:
        df = spark.sql(query)
    pdf = df.toPandas()
    pdf.columns = [c.lower() for c in pdf.columns]
    return pdf
