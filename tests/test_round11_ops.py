"""Round-11 additions: the shared capped-adjacency table for the
wedge-stream pair (q_jaccard_links / q_clustering_coef) — injection
must be result-identical to the standalone builds, and the wedge
self-join over the bucketed table must plan with zero exchanges
(VERDICT r10 task 6)."""

from pyspark.sql import functions as F


def _adj_fixture(spark, sf_dir):
    from locopy_spark.queries.mining import LP_DEGCAP, copurchase_edges
    from locopy_spark.sources.bucketed import write_bucketed

    e = copurchase_edges(spark, sf_dir).localCheckpoint()
    und = e.selectExpr("a AS v", "b AS n").unionAll(
        e.selectExpr("b AS v", "a AS n")
    )
    deg = und.groupBy("v").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    adj = und.join(deg.filter(f"d <= {LP_DEGCAP}").select("v"), "v")
    write_bucketed(adj, "t_r11_adj_cap", "v", n_buckets=4, sort_cols=["v"])
    return e, deg, spark.table("t_r11_adj_cap")


def test_capped_adjacency_injection_identity(spark, sf_dir):
    """Injecting the shared capped adjacency (with edges + degrees,
    the bench's round-11 shape) is result-identical to the standalone
    rebuild for BOTH wedge consumers.  For q_clustering_coef this also
    pins the degree-1-middle argument: the shared table keeps d=1
    rows the standalone center join drops, and they must contribute
    zero wedges."""
    from locopy_spark.queries.mining import q_clustering_coef, q_jaccard_links

    e, deg, adj = _adj_fixture(spark, sf_dir)
    for fn in (q_jaccard_links, q_clustering_coef):
        a = [tuple(r) for r in fn(spark, sf_dir).collect()]
        b = [
            tuple(r)
            for r in fn(
                spark, sf_dir, edges=e, degrees=deg, adjacency=adj
            ).collect()
        ]
        assert a == b, fn.__name__


def test_shared_adjacency_wedge_join_zero_exchange(spark, sf_dir):
    """The point of bucketing the adjacency by ``v``: both sides of
    the wedge self-join read the same bucketed+sorted table, so the
    join plans with ZERO exchanges and ZERO sorts — the per-query
    |2E|-row endpoint shuffle both consumers used to pay is gone.
    The unbucketed contrast is asserted too, so this fails loudly if
    Spark's bucket-scan planning ever changes.

    Auto-broadcast is disabled for the duration: at test SF the tiny
    table would plan a broadcast self-join (also exchange-free in the
    shuffle sense, but it hides the bucket scan this test pins — at
    warehouse scale the adjacency exceeds any broadcast threshold and
    the bucketed SortMergeJoin below is the real plan)."""
    from locopy_spark.plans import audit

    _, _, adj = _adj_fixture(spark, sf_dir)

    def wedge_plan(mid):
        w = (
            mid.alias("x")
            .join(mid.alias("y"), "v")
            .filter(F.col("x.n") < F.col("y.n"))
        )
        return audit.simple_plan(w)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = wedge_plan(adj)
        assert bucketed.count("Exchange") == 0
        assert audit.formatted_plan(
            adj.alias("x").join(adj.alias("y"), "v")
        ).count("Bucketed: true") == 2
        # contrast: the same join over a non-bucketed copy shuffles
        plain = wedge_plan(adj.localCheckpoint())
        assert plain.count("Exchange") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
