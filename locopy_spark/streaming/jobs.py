"""Structured Streaming twins of the batch event analytics.

The events parquet drives a file-source stream (in production: Kafka —
swap ``readStream.format``). Watermarks bound state; the batch twins in
``queries.events`` define the expected results, which the tests check
via the memory sink + ``processAllAvailable``.

The nanosecond-timestamp parquet can't stream through Spark's native
reader, so the stream schema reads ``ts`` as bigint nanos (same
``nanosAsLong`` trick as the batch loader) and derives the µs
timestamp column in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from locopy_spark.functions.numeric import exact_sum

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # the file source wants a directory: stream the sf dir, filtered to
    # the events file (in production this is a landing directory)
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.expr("timestamp_micros(ts_ns div 1000)")
    )


def stream_window_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed per-type aggregate with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            exact_sum("value", "sum_value"),
        )
    )


def stream_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation (dynamic gap-closed windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a streaming query to completion synchronously (tests)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
