"""ETL-surface queries: MERGE upsert and SCD-2 history, oracle-checked.

The update deltas are derived deterministically from the customer
table itself (every 10th key changes, every 100th key is brand-new) so
both engines construct identical inputs with no side files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.operators.merge import merge_upsert, scd2_apply
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


ORACLE: dict[str, str] = {
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
