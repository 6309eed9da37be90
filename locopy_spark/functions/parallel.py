"""Map-parallelism guard for compute-heavy narrow stages.

The engine's hot maps (md5 signature banks, Arrow matmul projections,
tokenize-and-explode scans) are shuffle-free by design — which means
their parallelism is capped by the INPUT's partition count, not the
cluster. A small corpus written as one parquet row group arrives as a
single split and serializes the whole map onto one core (measured 6×
on MinHash signature materialization at sf0.1: 6.3 s → 1.1 s).

``ensure_map_parallelism`` repartitions only when the plan has fewer
partitions than the session's parallelism: exactly the tiny-input case
where the shuffle is a few MB. At 100 TB the input carries far more
splits than cores and the guard is a structural no-op — the plan is
unchanged, no shuffle is added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_map_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition iff ``df`` has fewer partitions than the
    session's default parallelism. Call on simple scans (right after
    ``load_table``) ahead of a compute-heavy narrow map."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def ensure_group_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on the GROUP KEYS iff ``df`` has fewer
    partitions than the session's default parallelism — the aggregate
    variant of :func:`ensure_map_parallelism` for object-aggregate
    groupBys (``collect_set``/``collect_list``) whose partial
    aggregation is where the work lives: a few-row-group parquet
    arrives as 2-3 splits and the whole ObjectHashAggregate build
    serializes onto that many cores.  Repartitioning BY THE KEYS (not
    round-robin) means the downstream ``groupBy(*keys)`` reuses the
    exchange (guide §2.4: same keys, same partition count — no second
    shuffle), so locally this MOVES the aggregate's shuffle below the
    heavy build instead of adding one (r12 A/B on copurchase_edges at
    sf0.1: 1.9 → 1.25 s min, 3.5 → 1.6 s mean).  Shuffle bytes are
    ~unchanged: collect_set partial state retains every (group, item)
    pair, so the map-side combine it forgoes was not reducing volume.
    At 100 TB the input carries far more splits than cores and the
    guard is a structural no-op."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism, *keys)
    return df
