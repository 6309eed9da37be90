"""Deterministic spherical k-means (Lloyd) over an embedding column.

The IVF index (``operators.similarity.knn_ivf``) samples its coarse
quantizer; this is the production-grade trainer for it: alternating
assign (argmax cosine) / update (cluster mean) iterations expressed as
DataFrame plans. One crossJoin-against-broadcast-centroids + one
posexplode aggregation per iteration — both scale linearly in rows and
never shuffle the full vector table by key.

Determinism (same result on any partitioning, any cluster size):
 - seeds = k vectors with the lowest md5(id) (uniform pseudorandom,
   reproducible — same scheme as knn_ivf);
 - assignment ties broken by centroid_id;
 - centroid update via floor-scaled bigint sums per dimension (exact,
   associative) divided once — no float accumulation order anywhere;
 - the per-iteration driver collect is k×dim doubles (tiny, bounded),
   never O(n).

Iterative refinement is inherently non-single-SQL, so the entry-point
query (``s_kmeans``) reports an invariant row the oracle CAN check
(DuckDB-computed vector count + cluster/cosine bounds); objective
monotonicity, determinism and full coverage are unit-tested.

Reference analog: capitalone/locopy has no ML surface; this extends
the engine for the embedding-pipeline workloads (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from locopy_spark.functions.vectors import cosine_from_fixed, fixed_dot_expr
from locopy_spark.operators.similarity import with_fixed_norm
from locopy_spark.functions.cache import managed_persist

KM_SCALE = 1_000_000_000  # 1e9: per-dimension fixed-point for mean update


def _centroid_frame(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("c_emb", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(cents, schema)
    return df.withColumn("c_norm", F.expr(fixed_dot_expr("c_emb", "c_emb")))


def kmeans_spherical(
    emb: DataFrame,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Run Lloyd iterations; return (assignments, final centroids).

    Assignments: ``(id_col, centroid_id, cos)`` — every input row
    appears exactly once. Empty clusters keep their previous centroid.
    """
    spark = emb.sparkSession
    base = emb.select(id_col, vec_col)
    base = managed_persist(with_fixed_norm(base, vec_col), "kmeans")

    seeds = (
        base.withColumn("ck", F.expr(f"md5(cast({id_col} as string))"))
        .orderBy("ck")
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [(i, [float(x) for x in row[0]]) for i, row in enumerate(seeds)]

    def assign(cent_df: DataFrame) -> DataFrame:
        # argmax per vector as a hash aggregate (max over a
        # (cos, -centroid_id) struct = best cosine, ties to the lowest
        # centroid id) — same result as a row_number window but with
        # map-side partial aggregation and no per-partition sort
        scored = base.crossJoin(F.broadcast(cent_df)).withColumn(
            "cos",
            F.expr(
                cosine_from_fixed(
                    fixed_dot_expr(vec_col, "c_emb"), "norm_fix", "c_norm"
                )
            ),
        )
        m = scored.groupBy(id_col).agg(
            F.max(
                F.struct(
                    F.col("cos"),
                    (-F.col("centroid_id")).alias("ncid"),
                    F.col(vec_col).alias("v"),
                )
            ).alias("m")
        )
        return m.select(
            id_col,
            F.col("m.v").alias(vec_col),
            (-F.col("m.ncid")).cast("int").alias("centroid_id"),
            F.col("m.cos").alias("cos"),
        )

    assigned = assign(_centroid_frame(spark, cents))
    for _ in range(iters):
        stats = (
            assigned.select(
                "centroid_id", F.posexplode(vec_col).alias("dim", "x")
            )
            .groupBy("centroid_id", "dim")
            .agg(
                F.sum(
                    F.expr(f"cast(floor(x * {KM_SCALE} + 0.5) as bigint)")
                ).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cid.setdefault(r["centroid_id"], {})[r["dim"]] = (
                float(r["sx"]) / r["n"] / KM_SCALE
            )
        cents = [
            (
                cid,
                [by_cid[cid][d] for d in sorted(by_cid[cid])]
                if cid in by_cid
                else vec,  # empty cluster: keep previous centroid
            )
            for cid, vec in cents
        ]
        assigned = assign(_centroid_frame(spark, cents))
    return assigned, cents
