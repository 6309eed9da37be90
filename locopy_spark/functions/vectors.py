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
    for both engines (bigint→double conversion exact below 2^53).

    A ZERO-NORM vector (all-zero embedding — a real failure mode in
    upstream encoders, and possible mid-stream) has no direction:
    cosine is NULL, never an ANSI divide-by-zero crash.  Guarded here
    at the single shared helper so every caller (brute-force / LSH /
    IVF / int8 / PQ / dedup / drift) and both engines agree; NULL
    cosines then fall out of >= threshold filters on both sides."""
    return (
        f"CASE WHEN CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE) = 0.0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        f" CAST({dot} AS DOUBLE)"
        f" / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)) END"
    )


# -- product quantization ---------------------------------------------------
#
# PQ is deterministic end-to-end here: codebooks are a fixed md5
# sample of the data, per-subspace squared distances are fixed-point
# bigints (the fixed_dot convention), and argmin is folded into
# integer order via min(dist * K + j) — so both engines compute the
# IDENTICAL codes, ADC tables, and shortlists, and the oracle can
# rebuild the whole pipeline instead of settling for a tripwire.
# Overflow: per-element sq-diff ≤ 4·1e12, × sub_dim(8) ≤ 3.2e13,
# × K(16) ≤ 5.2e14 ≪ 2^63; the ADC sum over M(8) tables ≤ 2.6e14.


def _pq_dist_spark(v: str, cb: str, sub: int) -> str:
    """Fixed-point squared L2 distance between subspace ``m`` (outer
    lambda var) of vector column ``v`` and codeword ``j`` (outer
    lambda var) of the one-row codebook column ``cb`` (Spark SQL;
    free lambda vars ``m``/``j`` are bound by the caller's
    transforms)."""
    d = (
        f"(cast(element_at({v}, m * {sub} + i) as double)"
        f" - cast(element_at(element_at({cb}, j + 1), m * {sub} + i)"
        " as double))"
    )
    return (
        f"aggregate(transform(sequence(1, {sub}), "
        f"i -> cast(floor({d} * {d} * {FIXED_SCALE} + 0.5) as bigint)), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _pq_dist_duck(v: str, cb: str, sub: int) -> str:
    """DuckDB twin of :func:`_pq_dist_spark`."""
    d = f"({v}[m * {sub} + i]::DOUBLE - {cb}[j + 1][m * {sub} + i]::DOUBLE)"
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {sub}), "
        f"i -> CAST(FLOOR({d} * {d} * {FIXED_SCALE} + 0.5) AS BIGINT))) "
        "AS BIGINT)"
    )


def pq_encode_expr(v: str, cb: str, dim: int, n_sub: int, k: int) -> str:
    """PQ codes (array<int>, one 0-based codeword id per subspace) of
    vector column ``v`` against one-row codebook column ``cb`` —
    row-local, argmin-by-integer-order (ties → smallest codeword)."""
    dist = _pq_dist_spark(v, cb, dim // n_sub)
    return (
        f"transform(sequence(0, {n_sub - 1}), m -> "
        f"cast(array_min(transform(sequence(0, {k - 1}), "
        f"j -> {dist} * {k} + j)) % {k} as int))"
    )


def sql_pq_encode(v: str, cb: str, dim: int, n_sub: int, k: int) -> str:
    """DuckDB twin of :func:`pq_encode_expr`."""
    dist = _pq_dist_duck(v, cb, dim // n_sub)
    return (
        f"list_transform(generate_series(0, {n_sub - 1}), m -> "
        f"CAST(list_min(list_transform(generate_series(0, {k - 1}), "
        f"j -> {dist} * {k} + j)) % {k} AS INT))"
    )


def pq_qtab_expr(q: str, cb: str, dim: int, n_sub: int, k: int) -> str:
    """Per-query ADC lookup table (array<array<bigint>>, M×K): exact
    fixed-point distance from query column ``q`` to every codeword."""
    dist = _pq_dist_spark(q, cb, dim // n_sub)
    return (
        f"transform(sequence(0, {n_sub - 1}), m -> "
        f"transform(sequence(0, {k - 1}), j -> {dist}))"
    )


def sql_pq_qtab(q: str, cb: str, dim: int, n_sub: int, k: int) -> str:
    """DuckDB twin of :func:`pq_qtab_expr`."""
    dist = _pq_dist_duck(q, cb, dim // n_sub)
    return (
        f"list_transform(generate_series(0, {n_sub - 1}), m -> "
        f"list_transform(generate_series(0, {k - 1}), j -> {dist}))"
    )


def pq_adc_expr(qtab: str, codes: str, n_sub: int) -> str:
    """ADC approximate distance: Σ_m qtab[m][codes[m]] — O(M) lookups
    per (query, vector) pair instead of O(dim) multiplies (Spark)."""
    return (
        f"aggregate(transform(sequence(0, {n_sub - 1}), m -> "
        f"element_at(element_at({qtab}, m + 1), "
        f"element_at({codes}, m + 1) + 1)), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def sql_pq_adc(qtab: str, codes: str, n_sub: int) -> str:
    """DuckDB twin of :func:`pq_adc_expr`."""
    return (
        f"CAST(list_sum(list_transform(generate_series(0, {n_sub - 1}), "
        f"m -> {qtab}[m + 1][{codes}[m + 1] + 1])) AS BIGINT)"
    )


def fixed_dot_pandas():
    """Vectorized (Arrow) twin of :func:`fixed_dot_expr` — BIT-IDENTICAL
    by construction: each per-element product is the same IEEE double
    multiply, the ×FIXED_SCALE, +0.5, floor, int64 cast are the same
    correctly-rounded double ops, and the final sum is an INT64 sum —
    order-independent, so numpy's batch layout cannot perturb it
    (unlike a float matmul).  Use for broadcast-scan scorers whose pair
    volume makes the interpreted per-element SQL fold the bottleneck
    (knn/mips brute force, hubness); the SQL form stays the right tool
    for small candidate sets where a Python round-trip would dominate.

    Returns a pandas UDF (long); construct once per query plan.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    def dot(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        va = np.stack(a.to_numpy()).astype(np.float64)
        vb = np.stack(b.to_numpy()).astype(np.float64)
        d = (
            np.floor(va * vb * FIXED_SCALE + 0.5)
            .astype(np.int64)
            .sum(axis=1)
        )
        return pd.Series(d, dtype="int64")

    # real type objects, not strings: this module's `from __future__
    # import annotations` would otherwise stringify the hints and
    # pandas_udf cannot resolve them
    dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return F.pandas_udf(dot, "long")
