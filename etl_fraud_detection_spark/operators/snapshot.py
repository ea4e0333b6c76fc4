"""Corpus snapshot diff: what changed between two committed versions.

An incremental corpus build (the daily ingest the reference's cron job
models — etl.py's watermark extract + SCD merges) needs an audit of
what each refresh actually did: which documents appeared, vanished, or
changed content. With the versioned warehouse both snapshots are just
time-travel reads (`Warehouse.read_at`, the Delta ``VERSION AS OF``
idiom), and the diff itself is one full-outer join — no stored diff
log, no CDC stream, the snapshots ARE the source of truth.

Scale shape (100 TB): one full-outer shuffle join on the key. Content
comparison is md5 over the compare columns computed DURING each side's
scan (map-side), so the join carries (key, 32-byte digest) instead of
full rows; with both snapshots written bucketed on the key the exchange
disappears entirely (operators/joins.write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def null_safe_digest(cols: list[str]) -> Column:
    """md5 over the columns with NULLs encoded EXPLICITLY: each column
    becomes ``'1' || value`` when present and ``'0'`` when NULL, then
    the marked values join on a unit separator. Plain ``concat_ws``
    silently skips NULLs (no separator emitted), so (NULL,'x') and
    ('x',NULL) — and ('x',NULL) vs ('x') under ragged widths — would
    digest identically and a real change would classify as unchanged.
    The DuckDB spelling is ``coalesce('1' || CAST(c AS VARCHAR), '0')``
    joined by ``chr(31)`` — engine-portable by construction."""
    marked = [
        F.coalesce(
            F.concat(F.lit("1"), F.col(c).cast("string")), F.lit("0")
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *marked))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two snapshots as added / removed /
    changed (same key, different md5 over ``compare_cols``) —
    unchanged rows are dropped (they dominate any real refresh and
    carry no information). Returns (key, status)."""
    def digest(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key_col), null_safe_digest(compare_cols).alias("_h")
        )

    o = digest(old).withColumnRenamed("_h", "_h_old")
    n = digest(new).withColumnRenamed("_h", "_h_new")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(key_col, "status")
    )
