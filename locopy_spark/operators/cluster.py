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
at 100 TB, :func:`connected_components_star` implements alternating
large-star / small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which converges in O(log n)
rounds over the same join/groupBy primitives. ``localCheckpoint``
truncates lineage each round so plans don't grow with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Single-task arm threshold (SYMMETRIC edge rows): 1M edges is ~16 MB
# of long pairs — broadcast-scale data where one union-find task beats
# the iterative loop's ~2 jobs/round scheduling floor. Duplicate-cluster
# graphs are tiny relative to the corpus at every scale (candidates are
# threshold-filtered pairs), but a 100 TB adversarial graph that
# exceeds the cap falls back to the distributed loop below.
CC_LOCAL_EDGE_CAP = 1_000_000


def _cc_local(edges: DataFrame) -> DataFrame:
    """One-task union-find over a (src, dst) edge frame — the
    small-graph arm of :func:`connected_components`.  Union-by-min
    keeps the smaller id as every merge's root, so each tree's root IS
    the component minimum — identical output to the Hash-Min loop.
    Runs as a single ``mapInPandas`` task (no driver-side graph, no
    per-round jobs); cost is one pass over the edge list."""
    id_t = edges.schema["src"].dataType.simpleString()

    def uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                if s not in parent:
                    parent[s] = s
                if d not in parent:
                    parent[d] = d
                rs, rd = find(s), find(d)
                if rs < rd:
                    parent[rd] = rs
                elif rd < rs:
                    parent[rs] = rd
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "cluster_id": [find(x) for x in nodes]}
        )

    return edges.coalesce(1).mapInPandas(
        uf, schema=f"node {id_t}, cluster_id {id_t}"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    local_edge_cap: int = CC_LOCAL_EDGE_CAP,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (node, cluster_id) for every node that appears in an edge,
    cluster_id = minimum node id in the component (deterministic
    representative).

    Scale-adaptive (r12): below ``local_edge_cap`` symmetric edge rows
    the components are resolved by ONE union-find task
    (:func:`_cc_local`) — the Hash-Min loop costs ~2 jobs per round in
    pure scheduling (checkpoint + convergence signature), which
    dominates end-to-end time on the tiny threshold-filtered duplicate
    graphs every real dedup pass produces (measured: the r12 dedup
    family spends its CC seconds on job latency, not shuffle).  Above
    the cap — or with ``local_edge_cap=0`` — the distributed loop runs
    unchanged.  Both arms emit identical rows (pinned in
    tests/test_operators.py).
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
    if n_edges <= local_edge_cap:
        # no unpersist here: unlike the loop's labels (themselves
        # checkpointed), the returned frame READS the edges blocks
        return _cc_local(edges)
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
    def _sig(lbl: DataFrame) -> tuple:
        # one map-side-combined agg scan — labels only ever decrease,
        # so the xor-fold signature changes iff any label changed;
        # strictly cheaper than a new-vs-old join at scale
        row = lbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(node, label))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sig = _sig(labels)
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
        sig = _sig(new_labels)
        # drop the superseded checkpoint — keeps storage O(1) in
        # iteration count instead of accumulating every round
        labels.unpersist()
        labels = new_labels
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # labels are still moving: emitting them would silently keep
        # multiple representatives of one component downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(long-chain graph?). Raise max_iter or use "
            "connected_components_star (O(log n) star contraction)."
        )
    out = labels.select("node", F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge set: every neighbor
    strictly larger than u re-attaches to min(Γ(u) ∪ {u})."""
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select("u", F.least("u", "nbr_min").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward the smaller id,
    then re-attach each node's smaller neighbors (and itself) to their
    minimum."""
    oriented = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_links = mins.select("u", F.col("m").alias("v"))
    return rewired.union(self_links).distinct()


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — converges in O(log n) rounds even on long-chain
    graphs where Hash-Min label propagation needs diameter rounds.

    Same output contract as :func:`connected_components`: (node,
    cluster_id) with cluster_id = component minimum. Each round is two
    groupBy-join passes over an edge set that only shrinks (stars
    collapse onto their centers), so the per-round shuffle is bounded
    by the current edge count. Use this for adversarial graphs (URL
    chains, transitive near-dup runs); the default Hash-Min is cheaper
    on the near-clique graphs real dedup candidates form.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        edges_next = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        sig_row = edges_next.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold of row hashes: order-independent set signature
            # with no ANSI overflow (edges are distinct, so no
            # cancellation concerns)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        edges.unpersist()
        edges = edges_next
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} rounds."
        )
    # fixpoint: every edge points a node at its component min (star)
    roots = edges.select(F.col("v").alias("node"), F.col("v").alias("cluster_id"))
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    out = members.union(roots).distinct()
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
