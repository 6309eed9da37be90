"""Duplicate-cluster resolution: connected components over candidate
pairs.

Pair generators (``dedup.minhash_lsh_pairs`` & friends) emit *edges*;
an actual dedup pass needs *clusters* — each component keeps one
representative and drops the rest. This implements distributed
Hash-Min label propagation entirely in DataFrame ops:

    label(x) ← min(label(x), min over neighbors y of label(y))

iterated to fixpoint. Each round is one equi-join shuffle on node id +
one groupBy — no driver-side graph, no collect. Rounds needed =
component diameter; duplicate clusters are near-cliques (diameter ≤ 2-3
in practice), so convergence is fast. For adversarial long-chain graphs
at 100 TB, swap the propagation step for alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce"), which converges in O(log n) rounds over the same
join/groupBy primitives. ``localCheckpoint`` truncates lineage each
round so plans don't grow with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (node, cluster_id) for every node that appears in an edge,
    cluster_id = minimum node id in the component (deterministic
    representative).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size the iteration's parallelism to the GRAPH, not the session
    # default: duplicate graphs are tiny relative to the corpus, and a
    # 32-partition shuffle of 500 edges costs more in task scheduling
    # than the work itself. ~100k edges per partition, capped at the
    # session parallelism for big graphs.
    n_edges = edges.count()
    spark = pairs.sparkSession
    parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 100_000 + 1))
    edges = edges.repartition(parts, "dst").localCheckpoint(eager=True)
    # label(x) starts at min(x, min direct neighbor)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nbr_min")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        # pull the min label over neighbors through one join shuffle
        msg = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(msg, labels.node == msg.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # drop the superseded checkpoint — keeps storage O(1) in
        # iteration count instead of accumulating every round
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # labels are still moving: emitting them would silently keep
        # multiple representatives of one component downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(long-chain graph?). Raise max_iter or use star-contraction."
        )
    out = labels.select("node", F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out


def dedup_resolution(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_id, is_kept) — keep the min-id doc per cluster."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_kept"),
    )
