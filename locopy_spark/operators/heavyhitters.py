"""Distributed exact heavy hitters via a Misra-Gries candidate pass.

The scale problem: "which n-grams exceed share θ of a 100 TB corpus"
cannot afford a full groupBy — the distinct-key set (billions of
n-grams) IS the shuffle. The classic two-pass answer:

1. **Candidate pass** (this module): per-partition Misra-Gries
   summaries with capacity C. Mergeable-summaries guarantee (Agarwal
   et al., PODS'12): an item with partition count > n_p/(C+1) is
   present in that partition's summary, and by pigeonhole any item
   with GLOBAL count ≥ n/K (K ≤ C+1) exceeds that bound in at least
   one partition — so the union of summaries is a guaranteed
   SUPERSET of the true heavy hitters. Shuffled state: ≤ P×C rows,
   independent of the corpus's distinct-key count.
2. **Exact recount** (caller): broadcast-semi-join the token stream
   against the candidate set and aggregate only those keys — partial
   aggregation collapses them map-side, so the second shuffle is
   ≤ P × |candidates| rows. The final exact filter drops the
   false positives, so the result is EXACTLY the items with
   count ≥ n/K — deterministic regardless of MG internals.

The MG pass itself runs as an Arrow-batched ``mapInPandas`` stage
(per-partition state, vectorized value_counts; a row-at-a-time Python
UDF would be 10-100x slower).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(items: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys for ``items[col]``.

    Returns a DataFrame with a single ``col`` column holding the
    (deduplicated) union of every partition's summary keys — a
    guaranteed superset of all items with global count ≥ n/(capacity+1).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for key, c in pdf[col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > capacity:
                # mergeable-summaries truncation: subtract the
                # (capacity+1)-th largest count from everything and
                # keep the strictly-positive survivors
                d = sorted(counts.values(), reverse=True)[capacity]
                counts = {k: v - d for k, v in counts.items() if v > d}
        yield pd.DataFrame({col: list(counts.keys())})

    schema = f"{col} string"
    return items.mapInPandas(run, schema=schema).distinct()


def exact_heavy_hitters(
    items: DataFrame,
    col: str,
    k: int,
    capacity: int | None = None,
    total: DataFrame | None = None,
) -> DataFrame:
    """All items with count ≥ n/k, with exact counts.

    ``capacity`` defaults to ``2*k`` (any value ≥ k preserves the
    superset guarantee; slack reduces per-partition truncation).
    ``total`` may supply a cheaper one-row ``n_total`` frame (e.g.
    computed row-locally from array sizes, no explode); defaults to
    counting ``items``.
    """
    cap = capacity if capacity is not None else 2 * k
    if cap < k:
        raise ValueError(f"capacity {cap} must be ≥ k {k}")
    cands = mg_candidates(items, col, cap)
    exact = (
        items.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    if total is None:
        total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("n_occ") * k >= F.col("n_total"))
        .select(
            col,
            "n_occ",
            (F.col("n_occ").cast("double") / F.col("n_total")).alias("share"),
        )
    )
