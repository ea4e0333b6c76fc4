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

Implementation note: the delta sides (stg, src_keys) are joined through
prefixed-column projections rather than DataFrame-object references, so
callers may pass frames that share lineage (e.g. a file-fed dim whose
stg snapshot doubles as the delete key set) without tripping Spark's
ambiguous-self-join analysis.

Scale notes (100 TB): the merge joins are all equi-joins on the business
keys. stg (one day's delta) is orders of magnitude smaller than dwh, so
the joins resolve as broadcasts under AQE; the one unavoidable wide
operation is rewriting dwh partitions that contain changed keys.
Bucketing dwh parquet by a stable hash of the keys lets a real
deployment rewrite only affected buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.core import sentinel_ts

_P = "__stg_"  # delta-side column prefix


def _prefixed(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*[F.col(c).alias(_P + c) for c in cols])


def _key_cond(keys: list[str]) -> Column:
    return reduce(
        lambda a, b: a & b, [F.col(k) == F.col(_P + k) for k in keys]
    )


def _all_same(cols: list[str]) -> Column:
    """NULL-safe all-columns-equal — the reference's ``NOT EXISTS
    (dwh-cols INTERSECT stg-cols)`` comparator (etl.py:350-352,403-405).
    MUST be ``<=>``: plain ``=`` would silently skip NULL↔value changes."""
    return reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(_P + c)) for c in cols],
    )


def scd1_merge(
    dwh: DataFrame,
    stg: DataFrame,
    keys: list[str],
    cols: list[str],
    now: Column | None = None,
) -> DataFrame:
    """SCD1: in-place overwrite semantics, recomputed functionally.

    ``dwh`` schema: cols + create_dt + update_dt + processed_dt;
    ``stg``: cols + create_dt (batch date); ``cols`` includes the keys.
    """
    now = now if now is not None else F.current_timestamp().cast("timestamp_ntz")
    # the stage side is one day's delta — broadcast it rather than
    # sort-merge-shuffling the full dwh (stats-less frames won't pick
    # this up on their own)
    s = F.broadcast(_prefixed(stg, cols + ["create_dt"]))

    joined = dwh.join(s, _key_cond(keys), "left")
    apply_upd = F.col(_P + keys[0]).isNotNull() & ~_all_same(cols)
    updated = joined.select(
        *[F.when(apply_upd, F.col(_P + c)).otherwise(F.col(c)).alias(c) for c in cols],
        F.col("create_dt").alias("create_dt"),
        F.when(apply_upd, F.col(_P + "create_dt")).otherwise(F.col("update_dt")).alias("update_dt"),
        F.when(apply_upd, now).otherwise(F.col("processed_dt")).alias("processed_dt"),
    )

    dk = dwh.select(*[F.col(k).alias(_P + k) for k in keys])
    inserts = stg.join(dk, _key_cond(keys), "left_anti").select(
        *[F.col(c) for c in cols],
        F.col("create_dt"),
        F.lit(None).cast("timestamp_ntz").alias("update_dt"),
        now.alias("processed_dt"),
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
    key snapshot for delete detection (reference etl.py:201-208); for
    file-fed dims the daily file IS the snapshot, so callers pass
    ``stg.select(keys)`` (reference etl.py:165). None skips deletes.

    Assumes stg carries at most one row per key per batch (daily grain,
    as in the reference's one-file-per-day model).
    """
    now = now if now is not None else F.current_timestamp().cast("timestamp_ntz")
    today = today if today is not None else F.current_date().cast("timestamp_ntz")
    sentinel = sentinel_ts()
    hist_cols = cols + ["effective_from", "effective_to", "deleted_flg", "processed_dt"]

    history = dwh.where(F.col("effective_to") != sentinel)
    current = dwh.where(F.col("effective_to") == sentinel)

    # --- delete phase (reference etl.py:297-332) -------------------------
    if src_keys is not None:
        sk = _prefixed(src_keys, keys)
        live = current.where(~F.col("deleted_flg"))
        # feeds closed_deleted + tombstones + the kept_current anti-join;
        # persist so the anti-join runs once, not three times
        gone = live.join(sk, _key_cond(keys), "left_anti").persist()
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
        gone_keys = gone.select(*[F.col(k).alias(_P + k) for k in keys])
        kept_current = current.join(gone_keys, _key_cond(keys), "left_anti")
        history = history.unionByName(closed_deleted)
        current = kept_current.unionByName(tombstones)

    # --- update phase (reference etl.py:334-370) -------------------------
    # "Changed" = NOT(cols all null-safe equal AND deleted_flg == FALSE):
    # the INTERSECT lists append (dwh.deleted_flg, FALSE), so a tombstoned
    # current version counts as changed when its key is in stg.
    s = F.broadcast(_prefixed(stg, cols + ["create_dt"]))  # daily delta: small
    # closed / new_versions / untouched are three projections of this one
    # join — persist it so the union's branches share a single computation
    joined = current.join(s, _key_cond(keys), "left").persist()
    same = _all_same(cols) & (F.col("deleted_flg") == F.lit(False))
    is_changed = F.col(_P + keys[0]).isNotNull() & ~same

    closed = joined.where(is_changed).select(
        *[F.col(c) for c in cols],
        F.col("effective_from"),
        (F.col(_P + "create_dt") - F.expr("INTERVAL 1 SECOND")).alias("effective_to"),
        F.col("deleted_flg"),
        now.alias("processed_dt"),
    )
    new_versions = joined.where(is_changed).select(
        *[F.col(_P + c).alias(c) for c in cols],
        F.col(_P + "create_dt").alias("effective_from"),
        sentinel.alias("effective_to"),
        F.lit(False).alias("deleted_flg"),
        now.alias("processed_dt"),
    )
    untouched = joined.where(~is_changed).select(*[F.col(c) for c in hist_cols])

    # --- insert phase (reference etl.py:372-388): keys new to dwh --------
    dk = dwh.select(*[F.col(k).alias(_P + k) for k in keys]).distinct()
    inserts = stg.join(dk, _key_cond(keys), "left_anti").select(
        *[F.col(c) for c in cols],
        F.col("create_dt").alias("effective_from"),
        sentinel.alias("effective_to"),
        F.lit(False).alias("deleted_flg"),
        now.alias("processed_dt"),
    )

    return (
        history.unionByName(untouched)
        .unionByName(closed)
        .unionByName(new_versions)
        .unionByName(inserts)
    )
