"""Warehouse-style MERGE (upsert) and SCD-2 snapshot operators.

locopy users run MERGE/upsert against Redshift/Snowflake after a COPY
(reference: locopy/redshift.py:532 inserts, with upsert left to user
SQL). Spark-native: an upsert is a keyed outer join that prefers the
update side; SCD-2 history is the same join with validity intervals.
Both are pure DataFrame plans — one shuffle on the merge key,
broadcast when the update side is small (the common case: daily delta
into a 100 TB dimension).

In production these writes land on a transactional table format
(Delta/Iceberg `MERGE INTO`); this module is the engine-side semantics
those formats execute, so results are testable against a SQL oracle
without a table-format dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """UPSERT: update rows whose key matches, insert the rest.

    Equivalent to ``MERGE INTO target USING updates ON key WHEN MATCHED
    UPDATE SET * WHEN NOT MATCHED INSERT *``. The update side wins on
    every non-key column. Expressed as (target ANTI-JOIN update-keys)
    ∪ updates — identical result to the textbook full-outer-join
    formulation, but the anti join broadcasts a small delta (Spark
    cannot broadcast a full outer join), so merging a daily delta into
    a 100 TB table is a map-side filter + union, zero shuffles.
    ``key`` may be one column name or a composite key list.
    """
    key_cols = [key] if isinstance(key, str) else list(key)
    cols = target.columns
    keys = updates.select(*[F.col(k) for k in key_cols])
    if broadcast_updates:
        keys = F.broadcast(keys)
    kept = target.join(keys, key_cols, "left_anti")
    return kept.unionByName(updates.select(*cols))


def merge_additive(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: merge a delta of partial
    aggregates into a state table by ADDING the measure columns.

    The continuous-rollup pattern: instead of re-aggregating 100 TB of
    history per refresh, aggregate only the new partition and merge —
    valid for any commutative-monoid measure (counts, exact scaled
    sums, HLL sketches). One shuffle on the grouping keys, sized to
    |state|+|delta| groups, not raw rows.
    """
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in add_cols])
    )


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture log (I/U/D rows) to a snapshot.

    ``changelog`` rows carry ``op_col`` ∈ {'I','U','D'}, a monotonically
    increasing ``seq_col`` per key, and the full payload. Latest change
    per key wins (one window shuffle over the *changelog*, which is
    small relative to a 100 TB snapshot); a final 'D' removes the key,
    a final 'I'/'U' replaces-or-inserts the row. The snapshot itself is
    touched only by a broadcast-able anti join + union — the same
    zero-shuffle shape as :func:`merge_upsert`, so replaying a day of
    changes never reshuffles the base table.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    cols = snapshot.columns
    touched = F.broadcast(latest.select(F.col(key)))
    kept = snapshot.join(touched, key, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*cols)
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table → (key, change ∈
    {added, deleted, changed}) plus both payloads' compared columns.

    The reverse of :func:`cdc_apply`: derive a changelog from two
    versions. One full outer join on the key (a single co-partitioned
    shuffle of both sides; at 100 TB both sides bucket-store on the key
    and the exchange disappears). Unchanged rows are filtered out
    *after* the join but *before* any wide projection, so the output is
    proportional to the churn, not the table.
    """
    compare_cols = compare_cols or [c for c in old.columns if c != key]
    o = old.select(
        F.col(key).alias("__ok"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("__nk"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, F.col("__ok") == F.col("__nk"), "full_outer")
    old_s = F.struct(*[F.col(f"old_{c}") for c in compare_cols])
    new_s = F.struct(*[F.col(f"new_{c}") for c in compare_cols])
    change = (
        F.when(F.col("__ok").isNull(), F.lit("added"))
        .when(F.col("__nk").isNull(), F.lit("deleted"))
        .when(~old_s.eqNullSafe(new_s), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("__ok"), F.col("__nk")).alias(key),
            "change",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close changed rows, append new
    versions.

    ``current`` must carry ``valid_from``/``valid_to`` (null
    ``valid_to`` = open row). Updates close the open row at the
    update's ``effective_col`` and insert a new open row when any
    ``compare_cols`` value changed (all non-key data columns when
    omitted).
    """
    data_cols = compare_cols or [
        c
        for c in updates.columns
        if c not in (key, effective_col)
    ]
    open_rows = current.filter(F.col("valid_to").isNull())
    closed_rows = current.filter(F.col("valid_to").isNotNull())
    u = F.broadcast(
        updates.select(
            F.col(key).alias("__k"),
            F.col(effective_col).alias("__eff"),
            *[F.col(c).alias(f"__u_{c}") for c in data_cols],
        )
    )
    j = open_rows.join(u, F.col(key) == F.col("__k"), "left")
    changed = F.col("__k").isNotNull() & ~F.struct(
        *[F.col(c) for c in data_cols]
    ).eqNullSafe(F.struct(*[F.col(f"__u_{c}").alias(c) for c in data_cols]))
    # open rows: closed if changed, untouched otherwise
    still = j.select(
        key,
        *data_cols,
        "valid_from",
        F.when(changed, F.col("__eff")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
    )
    # new open versions for changed keys
    fresh = (
        j.filter(changed)
        .select(
            key,
            *[F.col(f"__u_{c}").alias(c) for c in data_cols],
            F.col("__eff").alias("valid_from"),
            F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        )
    )
    # brand-new keys (no open row)
    anti = updates.join(
        open_rows.select(F.col(key).alias("__ok")),
        F.col(key) == F.col("__ok"),
        "left_anti",
    ).select(
        key,
        *data_cols,
        F.col(effective_col).alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    out_cols = [key, *data_cols, "valid_from", "valid_to"]
    return (
        closed_rows.select(*out_cols)
        .unionByName(still)
        .unionByName(fresh)
        .unionByName(anti)
    )


def incremental_join(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    keys: list[tuple[str, str]],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Delta maintenance of a JOIN view (the join-side twin of
    :func:`merge_additive`'s aggregate maintenance).

    For a materialized view V = A ⋈ B, the rows added by new data
    (A = A₀ ⊎ ΔA, B = B₀ ⊎ ΔB) are exactly

        ΔV = (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so a refresh touches each base side once with a delta-sized build
    side instead of re-joining the full tables. Each term broadcasts
    its delta (the common case: a daily increment against a 100 TB
    base), making the whole refresh three map-side hash joins — zero
    base-sized shuffles. Returns ΔV; the caller unions it with the
    stored V (or feeds it to ``merge_additive`` when the view is an
    aggregate over the join).
    """
    a_keys = [k for k, _ in keys]

    def cond(lhs, rhs):
        c = None
        for ak, bk in keys:
            t = lhs[ak] == rhs[bk]
            c = t if c is None else (c & t)
        return c

    def bc(df):
        return F.broadcast(df) if broadcast_deltas else df

    # drop B's key columns: equal to A's by the join condition
    def proj(joined, lhs, rhs):
        return joined.select(
            *[lhs[c] for c in base_a.columns],
            *[rhs[c] for c in base_b.columns if c not in {b for _, b in keys}],
        )

    da, db = delta_a.alias("da"), delta_b.alias("db")
    a0, b0 = base_a.alias("a0"), base_b.alias("b0")
    return (
        proj(b0.join(bc(da), cond(da, b0)), da, b0)
        .unionByName(proj(a0.join(bc(db), cond(a0, db)), a0, db))
        # the delta-delta term hints too: without it Spark may plan a
        # sort-merge join (fresh file-scan deltas often lack stats),
        # reintroducing the shuffle this function exists to avoid
        .unionByName(proj(bc(da).join(db, cond(da, db)), da, db))
    )
