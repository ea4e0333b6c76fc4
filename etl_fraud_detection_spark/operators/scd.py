"""SCD1 / SCD2 merge engine — pure DataFrame → DataFrame transforms.

Reference semantics (reproduced exactly, Spark-first):
- SCD1 update: etl.py:390-407 — matched keys with any NULL-safe column
  difference get stg values, ``update_dt = stg.create_dt``,
  ``processed_dt = NOW()``.
- SCD insert: etl.py:372-388 — keys absent from dwh (ANY version) are
  appended; ``effective_from``/``create_dt`` := stg.create_dt.
- SCD2 update: etl.py:334-370 — close the current version at
  ``stg.create_dt - INTERVAL 1 SECOND`` and append a new live version;
  "changed" compares business columns PLUS ``deleted_flg`` vs FALSE, so a
  tombstoned key reappearing in stg gets a new live version.
- SCD2 delete: etl.py:297-332 — current live versions whose keys are
  absent from the full source key snapshot are closed at
  ``today - INTERVAL 1 SECOND`` and a tombstone row (copy of the latest
  version, ``deleted_flg = TRUE``, ``effective_from = today``, open-ended
  ``effective_to``) is appended.

Where Postgres used UPDATE..FROM statements (the reference's J6
self-join-update idiom), Spark recomputes the table functionally: split
current vs history, derive closed/new/tombstone row sets with joins, and
union. No collect(), no driver loops — every step is a distributed plan.

Scale notes (100 TB): the merge joins are all equi-joins on the business
keys. stg (one day's delta) is orders of magnitude smaller than dwh, so
`changes` and `inserts` resolve as broadcast joins under AQE; the one
unavoidable wide operation is rewriting dwh partitions that contain
changed keys. Partitioning dwh parquet by a stable hash bucket of the
keys lets a real deployment rewrite only affected buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.core import any_col_differs, nullsafe_all_equal, sentinel_ts


def _key_eq(left: DataFrame, right: DataFrame, keys: list[str]) -> Column:
    cond = left[keys[0]] == right[keys[0]]
    for k in keys[1:]:
        cond = cond & (left[k] == right[k])
    return cond


def scd1_merge(
    dwh: DataFrame,
    stg: DataFrame,
    keys: list[str],
    cols: list[str],
    now: Column | None = None,
) -> DataFrame:
    """SCD1: in-place overwrite semantics, recomputed functionally.

    ``dwh`` schema: cols + create_dt + update_dt + processed_dt
    ``stg`` schema: cols + create_dt (the batch date)
    ``cols`` includes the keys (reference mapping arrays do too).
    """
    now = now if now is not None else F.current_timestamp().cast("timestamp_ntz")
    changed = any_col_differs(stg, dwh, cols)

    joined = dwh.alias("dwh").join(stg.alias("stg"), _key_eq(dwh, stg, keys), "left")
    matched = F.col(f"stg.{keys[0]}").isNotNull()
    apply_upd = matched & changed
    updated = joined.select(
        *[F.when(apply_upd, stg[c]).otherwise(dwh[c]).alias(c) for c in cols],
        dwh["create_dt"].alias("create_dt"),
        F.when(apply_upd, stg["create_dt"]).otherwise(dwh["update_dt"]).alias("update_dt"),
        F.when(apply_upd, now).otherwise(dwh["processed_dt"]).alias("processed_dt"),
    )

    inserts = (
        stg.join(dwh, _key_eq(stg, dwh, keys), "left_anti")
        .select(
            *[F.col(c) for c in cols],
            F.col("create_dt"),
            F.lit(None).cast("timestamp_ntz").alias("update_dt"),
            now.alias("processed_dt"),
        )
    )
    return updated.unionByName(inserts)


def scd2_merge(
    dwh: DataFrame,
    stg: DataFrame,
    keys: list[str],
    cols: list[str],
    src_keys: DataFrame | None = None,
    now: Column | None = None,
    today: Column | None = None,
) -> DataFrame:
    """SCD2: full history + delete tombstones, recomputed functionally.

    ``dwh`` schema: cols + effective_from + effective_to + deleted_flg +
    processed_dt. ``stg``: cols + create_dt. ``src_keys``: full current
    key snapshot from the source (delete detection, reference
    etl.py:201-208); None skips the delete phase (file-fed dims don't
    get one in reference from_file either).

    Assumes stg carries at most one row per key per batch (daily grain,
    as in the reference's one-file-per-day model).
    """
    now = now if now is not None else F.current_timestamp().cast("timestamp_ntz")
    today = (
        today
        if today is not None
        else F.current_date().cast("timestamp_ntz")
    )
    sentinel = sentinel_ts()

    history = dwh.where(F.col("effective_to") != sentinel)
    current = dwh.where(F.col("effective_to") == sentinel)

    # --- delete phase (reference etl.py:297-332) -------------------------
    if src_keys is not None:
        live = current.where(~F.col("deleted_flg"))
        gone = live.join(src_keys, _key_eq(live, src_keys, keys), "left_anti")
        closed_deleted = gone.select(
            *[F.col(c) for c in cols],
            F.col("effective_from"),
            (today - F.expr("INTERVAL 1 SECOND")).alias("effective_to"),
            F.col("deleted_flg"),
            now.alias("processed_dt"),
        )
        tombstones = gone.select(
            *[F.col(c) for c in cols],
            today.alias("effective_from"),
            sentinel.alias("effective_to"),
            F.lit(True).alias("deleted_flg"),
            now.alias("processed_dt"),
        )
        kept_current = current.join(gone.select(*keys), _key_eq(current, gone.select(*keys), keys), "left_anti")
        history = history.unionByName(closed_deleted)
        current = kept_current.unionByName(tombstones)

    # --- update phase (reference etl.py:334-370) -------------------------
    # "Changed" = NOT(cols all null-safe equal AND deleted_flg == FALSE):
    # the INTERSECT lists append (dwh.deleted_flg, FALSE), so a tombstoned
    # current version always counts as changed when its key is in stg.
    joined = current.alias("cur").join(stg.alias("stg"), _key_eq(current, stg, keys), "left")
    same = nullsafe_all_equal(current, stg, cols) & (current["deleted_flg"] == F.lit(False))
    is_changed = stg[keys[0]].isNotNull() & ~same

    closed = joined.where(is_changed).select(
        *[current[c].alias(c) for c in cols],
        current["effective_from"].alias("effective_from"),
        (stg["create_dt"] - F.expr("INTERVAL 1 SECOND")).alias("effective_to"),
        current["deleted_flg"].alias("deleted_flg"),
        now.alias("processed_dt"),
    )
    new_versions = joined.where(is_changed).select(
        *[stg[c].alias(c) for c in cols],
        stg["create_dt"].alias("effective_from"),
        sentinel.alias("effective_to"),
        F.lit(False).alias("deleted_flg"),
        now.alias("processed_dt"),
    )
    untouched = joined.where(~F.coalesce(is_changed, F.lit(False))).select(
        *[current[c].alias(c) for c in cols],
        current["effective_from"].alias("effective_from"),
        current["effective_to"].alias("effective_to"),
        current["deleted_flg"].alias("deleted_flg"),
        current["processed_dt"].alias("processed_dt"),
    )

    # --- insert phase (reference etl.py:372-388): keys new to dwh --------
    inserts = (
        stg.join(dwh.select(*keys).distinct(), _key_eq(stg, dwh, keys), "left_anti")
        .select(
            *[F.col(c) for c in cols],
            F.col("create_dt").alias("effective_from"),
            sentinel.alias("effective_to"),
            F.lit(False).alias("deleted_flg"),
            now.alias("processed_dt"),
        )
    )

    return history.unionByName(untouched).unionByName(closed).unionByName(new_versions).unionByName(inserts)
