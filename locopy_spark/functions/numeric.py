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

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1000  # 3 decimal digits retained


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
