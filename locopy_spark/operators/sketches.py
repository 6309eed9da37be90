"""KMV (k-minimum-values) set sketches for cross-stratum overlap.

The contamination / source-overlap question at 100 TB is "how similar
are these corpora as SETS of shingles" — for every pair of sources.
Computing exact pairwise Jaccard needs a |shingles|-sized equi-join per
pair (d_contamination does exactly that for ONE benchmark set); at S
sources that is S² full scans. A KMV sketch compresses each stratum's
shingle set to its k smallest md5 values; any pair's Jaccard is then
estimated from the two k-vectors alone, so the full matrix costs one
corpus pass + an S²-row driver-sized join.

Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD'07): for sketches A, B with the
same k, take the k smallest of A ∪ B; the fraction of those present in
both sketches is an unbiased estimate of J(A, B) (stderr ≈
sqrt(J(1-J)/k)). When a stratum has < k distinct elements its sketch
IS the whole set and the estimate degenerates to the exact Jaccard.

Determinism / oracle story: the "random" order is md5 (identical hex
in Spark and DuckDB), and the scan-side filter only ever ADMITS a
superset of the true k minima — the final exact top-k over survivors
equals the exact top-k over the full set. So the whole sketch, and
every estimate derived from it, is bit-identical across engines,
partitionings and re-runs, and the DuckDB oracle checks exact values,
not tolerances.

Scale shape (NO input-sized shuffle anywhere):
 1. one pass: per-stratum ``approx_count_distinct`` of elements
    (map-side partial HLL, output = S rows);
 2. one pass: keep elements with md5-prefix u ≤ (8k+32)/n̂ — survivors
    ≈ 8k+32 distinct per stratum (Poisson tail < 1e-100 of missing a
    true top-k member; HLL's ±5 % error is absorbed by the 8× slack);
 3. salted two-level exact top-k on the bounded survivors
    (collect_set partial state ≤ survivors/salt_buckets per task).

Reference analog: capitalone/locopy has no sketch surface; this
extends the engine for corpus-overlap analytics (SURVEY §2.3 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double.
_HEX_PREFIX_LEN = 13
_HEX_PREFIX_SPACE = float(16**_HEX_PREFIX_LEN)

DEFAULT_K = 256


def _u01(h: Column) -> Column:
    """Uniform [0,1) double from a lowercase hex digest column."""
    return (
        F.conv(F.substring(h, 1, _HEX_PREFIX_LEN), 16, 10).cast("double")
        / F.lit(_HEX_PREFIX_SPACE)
    )


def kmv_sketch(
    elems: DataFrame,
    stratum_col: str,
    elem_col: str,
    k: int = DEFAULT_K,
    oversample: int = 8,
    slack: int = 32,
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-stratum KMV sketch of the DISTINCT ``elem_col`` values.

    Input may contain duplicate (stratum, element) rows — dedup happens
    inside the bounded aggregation, never as a full-input shuffle.
    Returns ``(stratum_col, kmv array<string>, n_sketch int)`` with
    ``kmv`` the sorted k smallest md5(element) hex digests.
    """
    h = elems.select(
        F.col(stratum_col).alias("__s"),
        F.md5(F.col(elem_col).cast("string")).alias("__h"),
    )
    # pass 1: approximate distinct-element count per stratum (tiny).
    # Counted on the RAW element, not its digest — same cardinality,
    # so the md5 work runs once (pass 2 only). The input is scanned
    # twice by design: persisting the exploded element stream would
    # materialize corpus-sized state at 100 TB, while a second
    # streaming pass costs only the (cheap, codegen'd) re-expansion.
    counts = elems.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.approx_count_distinct(elem_col).alias("__n")
    )
    target = float(oversample * k + slack)
    thresholds = counts.select(
        "__s",
        F.least(F.lit(1.0), F.lit(target) / F.col("__n")).alias("__frac"),
    )
    # pass 2: the admitted set is a PREFIX of the md5 order, so the
    # exact top-k over survivors == exact top-k over the full stratum
    bounded = h.join(F.broadcast(thresholds), "__s").where(
        _u01(F.col("__h")) <= F.col("__frac")
    )
    salted = bounded.withColumn(
        "__salt", F.pmod(F.hash("__h"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("__s", "__salt").agg(
        F.slice(F.sort_array(F.collect_set("__h")), 1, k).alias("__c")
    )
    return (
        partial.groupBy("__s")
        .agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("__c")))
                ),
                1,
                k,
            ).alias("kmv")
        )
        .select(
            F.col("__s").alias(stratum_col),
            "kmv",
            F.size("kmv").alias("n_sketch"),
        )
    )


def kmv_jaccard_matrix(sketches: DataFrame, stratum_col: str, k: int) -> DataFrame:
    """Pairwise Jaccard estimates from a KMV sketch table.

    The sketch table is S rows of ≤k strings — driver-small for any
    realistic source count — so the pair join broadcasts one side and
    every estimate is array arithmetic on two k-vectors. Output:
    ``(<stratum>_a, <stratum>_b, n_a, n_b, est_jaccard)`` for a < b.
    """
    a = sketches.select(
        F.col(stratum_col).alias("sa"),
        F.col("kmv").alias("va"),
        F.col("n_sketch").alias("n_a"),
    )
    b = sketches.select(
        F.col(stratum_col).alias("sb"),
        F.col("kmv").alias("vb"),
        F.col("n_sketch").alias("n_b"),
    )
    merged = F.array_sort(F.array_union("va", "vb"))  # set union, sorted
    kk = F.least(F.lit(k), F.size(merged))
    topk = F.slice(merged, F.lit(1), kk)
    inter = F.array_intersect("va", "vb")
    return (
        a.join(F.broadcast(b), F.col("sa") < F.col("sb"))
        .select(
            F.col("sa").alias(f"{stratum_col}_a"),
            F.col("sb").alias(f"{stratum_col}_b"),
            "n_a",
            "n_b",
            (
                F.size(F.array_intersect(topk, inter)).cast("double")
                / kk.cast("double")
            ).alias("est_jaccard"),
        )
    )
