"""Deterministic numeric aggregation helpers.

Double summation is partition-order dependent; at 1000 executors the
same query returns different last-bits run to run and can never
hash-match a single-threaded oracle. And decimal casts of doubles are
NOT portable either: engines disagree (multiply-then-rint vs exact
BigDecimal rounding) on values within 1 ulp of a rounding tie.

The scheme here uses only exactly-specified IEEE ops, so every engine
produces bit-identical results: per row, ``floor(x * 1000 + 0.5)``
(one multiply, one add, one floor — all correctly rounded, identical
everywhere) yields a BIGINT; the SUM over bigints is exact and
associative; one final ``/ 1000.0`` converts back. Three decimal
digits are retained — ample for money aggregates, and the scaled sums
stay below 2^53 up to ~sf100 so the bigint→double conversion is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

SCALE = 1000  # 3 decimal digits retained

# Spark 4 reads parquet timestamps without a UTC flag as TIMESTAMP_NTZ
# (spark.sql.parquet.inferTimestampNTZ.enabled defaults true), on which
# unix_micros() is an analysis error; older runtimes read the same files
# as TIMESTAMP (LTZ), on which the NTZ-literal timestampdiff idiom is
# session-TZ-dependent. epoch_us() resolves the expression's actual type
# (schema analysis only — no job) and picks the correct idiom, so query
# code is byte-identical under either runtime and either timestamp type.

_NTZ_EPOCH = "timestamp_ntz'1970-01-01 00:00:00'"


def sql_epoch_us(df: DataFrame, expr: str) -> str:
    """SQL fragment: epoch microseconds (BIGINT) of a timestamp
    expression, robust to both TIMESTAMP and TIMESTAMP_NTZ inputs.

    DuckDB twin: ``epoch_us(expr)`` — both yield the same integers on
    parquet data (µs truncation agrees; NTZ diff against the naive
    epoch equals DuckDB's epoch of the naive timestamp).
    """
    dtype = df.select(F.expr(expr)).schema[0].dataType
    if isinstance(dtype, TimestampNTZType):
        return f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ({expr}))"
    return f"unix_micros({expr})"


def epoch_us(df: DataFrame, expr: str) -> Column:
    """Column form of :func:`sql_epoch_us`."""
    return F.expr(sql_epoch_us(df, expr))


_US_PER_DAY = 86_400_000_000


def sql_epoch_day(df: DataFrame, expr: str) -> str:
    """SQL fragment: FLOORED epoch day (BIGINT) of a timestamp
    expression. Plain ``div`` truncates toward zero, which collapses
    all pre-1970 timestamps into a double-width day-0 bin; this floors
    toward negative infinity in exact integer arithmetic (``%`` in
    Spark follows the dividend's sign, so a negative non-exact
    remainder marks the rows that need the -1 correction — no float
    division, so no ulp risk at day boundaries).

    DuckDB twin: ``datediff('day', DATE '1970-01-01', CAST(x AS
    DATE))`` (date truncation floors), or the same div/remainder form
    over ``epoch_us``.
    """
    us = sql_epoch_us(df, expr)
    return (
        f"((({us}) div {_US_PER_DAY})"
        f" - (case when (({us}) % {_US_PER_DAY}) < 0 then 1 else 0 end))"
    )


def _as_col(expr: Column | str) -> Column:
    return F.col(expr) if isinstance(expr, str) else expr


def exact_sum(expr: Column | str, alias: str) -> Column:
    """Deterministic SUM of a double expression, returned as double.

    SQL twin: :func:`sql_exact_sum`.
    """
    col = _as_col(expr)
    scaled = F.floor(col * SCALE + F.lit(0.5)).cast("long")
    return (F.sum(scaled).cast("double") / F.lit(float(SCALE))).alias(alias)


def exact_avg(expr: Column | str, alias: str) -> Column:
    """Deterministic AVG: exact scaled sum / count, double division.

    SQL twin: :func:`sql_exact_avg`.
    """
    col = _as_col(expr)
    scaled = F.floor(col * SCALE + F.lit(0.5)).cast("long")
    return (
        F.sum(scaled).cast("double") / F.lit(float(SCALE)) / F.count(col)
    ).alias(alias)


def sql_exact_sum(expr: str, alias: str | None = None) -> str:
    """The DuckDB-side twin of :func:`exact_sum`."""
    core = (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {SCALE} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE}.0"
    )
    return f"{core} AS {alias}" if alias else core


def sql_exact_avg(expr: str, alias: str | None = None) -> str:
    """The DuckDB-side twin of :func:`exact_avg`."""
    core = f"{sql_exact_sum(expr)} / COUNT({expr})"
    return f"{core} AS {alias}" if alias else core
