"""Deterministic sampling operators for training-corpus construction.

Balanced per-stratum downsampling ("at most K docs per language /
source / domain") is the standard rebalancing step before pretraining.
Naive implementations use ``Window.partitionBy(stratum)`` — which puts
an entire stratum in ONE task, a non-starter when one language holds
half of 100 TB. Here the exact top-K-per-stratum is computed with a
salted two-level aggregation of *bounded* buffers:

1. group by (stratum, salt): ``sort_array(collect_list(...))`` sliced
   to K — partial aggregation combines map-side, so no buffer ever
   exceeds K rows, and each stratum's work spreads over ``salt_buckets``
   tasks;
2. group by stratum: flatten the ≤ ``salt_buckets`` candidate arrays,
   sort, slice K, explode.

Both shuffles move at most ``strata × salt_buckets × K`` rows — output
-sized, not input-sized. Selection order is a portable md5 of the id
(stable across engines, partitionings and re-runs — unlike ``rand()``),
so the sample is reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_top_k(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    k: int,
    payload_cols: list[str],
    salt_buckets: int = 64,
) -> DataFrame:
    """Exact smallest-K rows per stratum under ``order_col`` (must be a
    total order — include a unique id as the last payload-free
    tie-break inside ``order_col`` construction when values can tie).
    """
    item = F.struct(F.col(order_col), *[F.col(c) for c in payload_cols])
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*payload_cols), F.lit(salt_buckets))
    )
    partial = salted.groupBy(stratum_col, "__salt").agg(
        F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("__cand")
    )
    final = partial.groupBy(stratum_col).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__cand"))), 1, k
        ).alias("__cand")
    )
    return final.select(stratum_col, F.explode("__cand").alias("__r")).select(
        stratum_col, f"__r.{order_col}", *[f"__r.{c}" for c in payload_cols]
    )


def balanced_sample(
    docs: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen by md5(id) order —
    deterministic, engine-portable balanced downsampling."""
    h = docs.withColumn(
        "__h", F.md5(F.col(id_col).cast("string"))
    )
    return stratified_top_k(
        h,
        stratum_col=stratum_col,
        order_col="__h",
        k=k,
        payload_cols=[id_col],
        salt_buckets=salt_buckets,
    ).drop("__h")
