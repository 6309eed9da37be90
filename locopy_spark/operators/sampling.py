"""Deterministic sampling operators for training-corpus construction.

Balanced per-stratum downsampling ("at most K docs per language /
source / domain") is the standard rebalancing step before pretraining.
Naive implementations use ``Window.partitionBy(stratum)`` — which puts
an entire stratum in ONE task, a non-starter when one language holds
half of 100 TB.

Scale design (two passes over the input, both cheap):

1. **Uniform-hash threshold pre-filter** (``uniform_hash_prefilter``):
   the selection order is md5(id) — uniform on [0, 1) by construction —
   and the top-K filter is a *prefix* of that same order.  So a first
   pass counts rows per stratum (column-pruned scan + map-side-combined
   count, buffers O(strata)), and a second pass broadcast-joins the
   per-stratum keep-fraction ``min(1, (8·K + 32) / n)`` and filters.
   Survivors number ~``8·K + 32`` per stratum, and because the filter
   and the final selection use the SAME key, any stratum with ≥ K
   survivors yields exactly the global top-K.  Shortfall probability is
   the Poisson lower tail ``P(Pois(8K+32) < K)`` — < 4e-18 even at K=1,
   < 1e-100 for K ≥ 32; raise ``oversample`` for more margin.  No
   unbounded state anywhere: both shuffles after the pre-filter carry
   only ~``strata × (8K+32)`` rows.

2. **Exact two-level salted top-K** (``stratified_top_k``) on the
   bounded survivor set: group by (stratum, salt) → sort/slice K, then
   group by stratum → flatten/sort/slice K.  ``collect_list`` buffers
   whole groups before the slice, so this step alone is only safe on
   pre-bounded input — which is why ``balanced_sample`` always
   pre-filters first.  (Round-1 shipped step 2 alone and claimed the
   buffers were bounded; they were not — partial aggregation merges the
   full per-group lists.  The pre-filter is what actually bounds them.)

Selection order is a portable md5 of the id (stable across engines,
partitionings and re-runs — unlike ``rand()``), so the sample is
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double.
_HEX_PREFIX_LEN = 13
_HEX_PREFIX_SPACE = float(16**_HEX_PREFIX_LEN)


def uniform_hash_prefilter(
    df: DataFrame,
    stratum_col: str,
    hash_col: str,
    k: int,
    oversample: int = 8,
    slack: int = 32,
) -> DataFrame:
    """Keep the ~``oversample·k + slack`` smallest-``hash_col`` rows per
    stratum, where ``hash_col`` is a uniform hex hash (e.g. md5).

    Because the kept set is a prefix of the eventual selection order,
    the exact top-K over the survivors equals the exact top-K over the
    full stratum whenever ≥ k rows survive — a Poisson-tail certainty
    (see module docstring).  Two input scans: a column-pruned count and
    a broadcast-joined filter; no input-sized shuffle.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    target = float(oversample * k + slack)
    thresholds = counts.select(
        stratum_col,
        F.least(F.lit(1.0), F.lit(target) / F.col("__n")).alias("__frac"),
    )
    u = (
        F.conv(F.substring(F.col(hash_col), 1, _HEX_PREFIX_LEN), 16, 10)
        .cast("double")
        / F.lit(_HEX_PREFIX_SPACE)
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .where(u <= F.col("__frac"))
        .drop("__frac")
    )


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

    NOTE: ``collect_list`` accumulates each (stratum, salt) group in
    full before the slice, so per-group state is O(group size) — run
    ``uniform_hash_prefilter`` first (as ``balanced_sample`` does) when
    the input is large and the order key is a uniform hash; this keeps
    every group at ~``(8k + 32) / salt_buckets`` rows.  The salt still
    matters post-filter: it spreads each stratum over ``salt_buckets``
    tasks instead of one.
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
    oversample: int = 8,
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen by md5(id) order —
    deterministic, engine-portable balanced downsampling.

    Pipeline: md5 selection key → uniform-hash threshold pre-filter
    (bounds all downstream state to ~``8k+32`` rows per stratum) →
    exact two-level salted top-K on the survivors.
    """
    h = docs.withColumn("__h", F.md5(F.col(id_col).cast("string")))
    bounded = uniform_hash_prefilter(
        h, stratum_col=stratum_col, hash_col="__h", k=k, oversample=oversample
    )
    return stratified_top_k(
        bounded,
        stratum_col=stratum_col,
        order_col="__h",
        k=k,
        payload_cols=[id_col],
        salt_buckets=salt_buckets,
    ).drop("__h")
