"""Vector (embedding) column expressions with DuckDB SQL twins.

Cosine similarity across engines must be bit-identical for the oracle
gate, but float fold order differs between engines. Solution: a
fixed-point dot product — each per-element product is computed in
double (exact IEEE, same both sides), scaled by 1e12, floored to a
BIGINT, and summed exactly. The final cosine divides bigints converted
to double (exact below 2^53) — every step deterministic everywhere.

All expressions are Catalyst built-ins (higher-order functions on the
array column) — JVM-side, no Python in the loop.
"""

from __future__ import annotations

FIXED_SCALE = 1_000_000_000_000  # 1e12: float32 inputs → ~12 sig digits kept


def fixed_dot_expr(a: str, b: str) -> str:
    """Fixed-point dot product of two array<float> columns (Spark SQL)."""
    prod = f"(cast(element_at({a}, i) as double) * cast(element_at({b}, i) as double))"
    return (
        f"aggregate(transform(sequence(1, size({a})), "
        f"i -> cast(floor({prod} * {FIXED_SCALE} + 0.5) as bigint)), "
        f"cast(0 as bigint), (acc, x) -> acc + x)"
    )


def sql_fixed_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`fixed_dot_expr`."""
    prod = f"({a}[i]::DOUBLE * {b}[i]::DOUBLE)"
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST(FLOOR({prod} * {FIXED_SCALE} + 0.5) AS BIGINT))) AS BIGINT)"
    )


def cosine_from_fixed(dot: str, na: str, nb: str) -> str:
    """Cosine from fixed-point dot + squared norms — identical SQL text
    for both engines (bigint→double conversion exact below 2^53)."""
    return (
        f"CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE))"
    )
