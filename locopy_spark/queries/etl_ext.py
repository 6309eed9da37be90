"""ETL-surface queries: MERGE upsert and SCD-2 history, oracle-checked.

The update deltas are derived deterministically from the customer
table itself (every 10th key changes, every 100th key is brand-new) so
both engines construct identical inputs with no side files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.operators.merge import (
    cdc_apply,
    merge_upsert,
    scd2_apply,
    snapshot_diff,
)
from locopy_spark.sources.tables import load_table

NEW_KEY_OFFSET = 1_000_000


def _updates(c: DataFrame) -> DataFrame:
    """Deterministic delta: changed rows + brand-new keys."""
    changed = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    fresh = c.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + NEW_KEY_OFFSET).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return changed.unionByName(fresh)


_SQL_UPDATES = f"""
  upd AS (
    SELECT c_custkey, c_name, c_nationkey,
           c_acctbal + 100.0 AS c_acctbal,
           'UPDATED' AS c_mktsegment
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey + {NEW_KEY_OFFSET}, 'new_' || c_name, c_nationkey,
           0.0, 'NEW'
    FROM customer WHERE c_custkey % 100 = 0
  )
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the delta into customer; emit the merged table."""
    c = load_table(spark, sf_dir, "customer")
    return merge_upsert(c, _updates(c), key="c_custkey").orderBy("c_custkey")


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2: open rows seeded at 1990-01-01, delta effective
    2000-01-01 closes changed rows and appends new versions."""
    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("1990-01-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    updates = _updates(c).withColumn(
        "eff", F.lit("2000-01-01").cast("timestamp_ntz")
    )
    out = scd2_apply(current, updates, key="c_custkey", effective_col="eff")
    return out.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.col("valid_from").cast("date").cast("string").alias("valid_from"),
        # sentinel for open rows: NULL dates stringify differently
        # (None vs NaT) across pandas paths
        F.coalesce(
            F.col("valid_to").cast("date").cast("string"), F.lit("9999-12-31")
        ).alias("valid_to"),
    ).orderBy("c_custkey", "valid_from", "c_mktsegment")


def _changelog(c: DataFrame) -> DataFrame:
    """Deterministic I/U/D changelog over customer: two successive
    updates for every 10th key (latest must win), a later delete for
    every 30th (trumping its updates), fresh inserts for every 100th."""
    pay = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    u1 = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 50.0).alias("c_acctbal"),
        F.lit("CDC_U1").alias("c_mktsegment"),
    )
    u2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 80.0).alias("c_acctbal"),
        F.lit("CDC_U2").alias("c_mktsegment"),
    )
    types = dict(c.dtypes)
    d = c.filter(F.col("c_custkey") % 30 == 0).select(
        "c_custkey",
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
        *[F.lit(None).cast(types[p]).alias(p) for p in pay],
    )
    ins = c.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + NEW_KEY_OFFSET).alias("c_custkey"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CDC_I").alias("c_mktsegment"),
    )
    return u1.unionByName(u2).unionByName(d).unionByName(ins)


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay an I/U/D changelog onto the customer snapshot
    (latest-change-per-key wins; deletes drop the key)."""
    c = load_table(spark, sf_dir, "customer")
    return cdc_apply(c, _changelog(c), key="c_custkey", seq_col="seq").orderBy(
        "c_custkey"
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction: diff two versions of orders → added / deleted /
    changed rows only (churn-proportional output)."""
    o = load_table(spark, sf_dir, "orders")
    new = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + NEW_KEY_OFFSET).alias("o_orderkey"),
                *[c for c in o.columns if c != "o_orderkey"],
            )
        )
    )
    return snapshot_diff(
        o, new, key="o_orderkey", compare_cols=["o_totalprice", "o_orderstatus"]
    ).orderBy("o_orderkey", "change")


ORACLE: dict[str, str] = {
    "q_cdc_apply": f"""
      WITH chg AS (
        SELECT c_custkey, 'U' AS op, 1 AS seq, c_name, c_nationkey,
               c_acctbal + 50.0 AS c_acctbal, 'CDC_U1' AS c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, 'U', 2, c_name, c_nationkey,
               c_acctbal + 80.0, 'CDC_U2'
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, 'D', 3, NULL, NULL, NULL, NULL
        FROM customer WHERE c_custkey % 30 = 0
        UNION ALL
        SELECT c_custkey + {NEW_KEY_OFFSET}, 'I', 1, 'new_' || c_name,
               c_nationkey, 0.0, 'CDC_I'
        FROM customer WHERE c_custkey % 100 = 0
      ),
      latest AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY seq DESC) AS rn
          FROM chg) WHERE rn = 1
      )
      SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
             c.c_mktsegment
      FROM customer c
      WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM latest WHERE op <> 'D'
      ORDER BY c_custkey
    """,
    "q_snapshot_diff": f"""
      WITH newv AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + {NEW_KEY_OFFSET}, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 1000 = 0
      ),
      oldv AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'deleted'
                  ELSE 'changed' END AS change,
             o.o_totalprice AS old_o_totalprice,
             o.o_orderstatus AS old_o_orderstatus,
             n.o_totalprice AS new_o_totalprice,
             n.o_orderstatus AS new_o_orderstatus
      FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
         OR o.o_totalprice <> n.o_totalprice
         OR o.o_orderstatus <> n.o_orderstatus
      ORDER BY o_orderkey, change
    """,
    "q_merge_upsert": f"""
      WITH {_SQL_UPDATES}
      SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
      FROM customer t FULL OUTER JOIN upd u ON t.c_custkey = u.c_custkey
      ORDER BY c_custkey
    """,
    # every customer key < offset gets an update when %10=0 (data
    # always changes: acctbal+100), so: unchanged open rows stay open,
    # changed rows close at 2000-01-01 + a new open version, fresh keys
    # (offset) appear as open rows
    "q_scd2_history": f"""
      WITH {_SQL_UPDATES}
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             '1990-01-01' AS valid_from,
             CASE WHEN c_custkey % 10 = 0 THEN '2000-01-01'
                  ELSE '9999-12-31' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             '2000-01-01', '9999-12-31'
      FROM upd
      ORDER BY c_custkey, valid_from, c_mktsegment
    """,
}


IVM_CUT = "1995-06-01"  # arrival cutover for the join-view refresh


def q_incr_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the orders ⋈ lineitem
    revenue view refreshed as stored-view + delta (operators.merge.
    incremental_join: ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, each term broadcasting
    its delta — no base-sized shuffle). Both tables split at IVM_CUT
    on their own date column (orders by o_orderdate, lineitem by
    l_shipdate), so the deltas genuinely cross-join the opposite base.
    The ORACLE is the one-shot full join: incremental == batch, the
    property that lets a 100 TB join view refresh by touching only
    the new partitions.
    """
    from locopy_spark.functions.numeric import exact_sum
    from locopy_spark.operators.merge import incremental_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    cut = F.lit(IVM_CUT).cast("date")
    # exhaustive split: NULL dates fail BOTH < and >= predicates and
    # would silently vanish from the view — route them to the delta
    # side (unknown arrival time == treat as new)
    o0 = o.filter(F.col("o_orderdate") < cut)
    do = o.filter(
        (F.col("o_orderdate") >= cut) | F.col("o_orderdate").isNull()
    )
    l0 = li.filter(F.col("l_shipdate") < cut)
    dl = li.filter(
        (F.col("l_shipdate") >= cut) | F.col("l_shipdate").isNull()
    )
    stored = o0.join(l0, o0["o_orderkey"] == l0["l_orderkey"]).select(
        *o.columns, "l_shipdate", "l_extendedprice", "l_discount"
    )
    delta = incremental_join(
        o0, do, l0, dl, keys=[("o_orderkey", "l_orderkey")]
    )
    view = stored.unionByName(delta)
    return (
        view.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy("o_orderpriority")
    )


def _oracle_incr_join_view() -> str:
    from locopy_spark.functions.numeric import sql_exact_sum

    return f"""
      SELECT o_orderpriority,
             COUNT(*) AS n_rows,
             {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY 1
    """


ORACLE["q_incr_join_view"] = _oracle_incr_join_view()
