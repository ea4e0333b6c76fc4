"""Temporal operators over event streams: sessionization and the
generic as-of (point-in-time) join.

The reference's signature join is already point-in-time (fact BETWEEN
effective_from AND effective_to — plans/fraud.py); these are the two
generalizations a training-data/event pipeline needs when the right side
has no materialized validity intervals:

- sessionize: gap-based session assignment (the batch twin of
  Structured Streaming's session_window).
- asof_join: for every left row, the latest right row with
  right_ts <= left_ts per key — without building interval columns
  first.

Both are single-shuffle: everything happens inside one window over the
key columns. The as-of join deliberately avoids the naive
join-then-filter-then-argmax plan (a key-equi join that explodes to
|L|x|R| per key before pruning); instead it unions the two sides and
carries the last right row forward with last(ignoreNulls) — linear in
|L|+|R|, skew-safe, and the same shape Flink/KDB as-of joins execute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign a per-key session sequence number: a new session starts
    when the gap to the previous event is STRICTLY greater than
    ``gap_minutes``. Output = input + ``session_seq`` (1-based).

    One shuffle on the keys; the lag and the running sum share the same
    window spec so Catalyst plans a single Exchange+Sort."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    prv = F.lag(ts_col).over(w)
    new_sess = F.when(
        prv.isNull()
        | (F.col(ts_col) > prv + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        1,
    ).otherwise(0)
    seq = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn("session_seq", seq.cast("long"))


def rolling_time_window(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Trailing time-RANGE window aggregates: for every event, the
    count / exact cent-sum / max of the same key's events in the
    preceding ``window_seconds`` (inclusive of the current row) — the
    rolling-rate / velocity feature of a fraud or abuse pipeline
    (events-per-hour, amount-per-hour at each event).

    This is the RANGE-frame counterpart of the ROWS frames the fraud
    rules use (W3-W5): the frame is bounded by a TIME interval, not a
    row count, so ties and bursts are handled by value, and the frame
    ordering key is the truncated wall-clock second — computed as
    timestampdiff from a fixed NTZ anchor, NOT a timestamp→long cast,
    so the key is identical whatever the session time zone (the
    correctness driver's session is not tuned by this engine). One
    shuffle on the entity key; all three aggregates share the single
    window spec. The sum is integer cents (exact, order-independent —
    the value column is a float amount)."""
    sec = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(sec)
        .rangeBetween(-window_seconds, 0)
    )
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    return events.select(
        *key_cols,
        F.col(ts_col),
        F.col(value_col),
        F.count("*").over(w).alias("n_trailing"),
        F.sum(cents).over(w).alias("sum_trailing_cents"),
        F.max(value_col).over(w).alias("max_trailing"),
    )


def resample_ffill(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "1 HOUR",
    order_col: str = "event_id",
) -> DataFrame:
    """Regularize an irregular event series onto a fixed time grid with
    forward-fill (the hypertable gapfill + locf operator): per key, one
    slot per ``interval`` from the floor of its first event to the floor
    of its last, each slot sampling the latest observation at-or-before
    the slot instant (NULL when none yet — the first slot can precede
    the first event).

    Composition, not a new engine path: grid = per-key bounds aggregate
    + ``sequence`` explode (one shuffle, then map-only fan-out), fill =
    the existing union+last(ignoreNulls) as-of join (one more shuffle
    on the same keys). Ties at one instant resolve to the greatest
    ``order_col`` — mirrored by arg_max in an external oracle."""
    iv = F.expr(f"INTERVAL {interval}")
    trunc_unit = interval.split()[-1].lower().rstrip("s")
    bounds = events.groupBy(*key_cols).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_t0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("_t1"),
    )
    grid = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("_t0"), F.col("_t1"), iv)).alias("slot_ts"),
    )
    # one observation per (key, instant): latest order_col wins
    obs = events.groupBy(*key_cols, ts_col).agg(
        F.max_by(value_col, order_col).alias(value_col)
    )
    return asof_join(
        grid, obs, key_cols, left_ts="slot_ts", right_ts=ts_col,
        right_value_cols=[value_col],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance_minutes: int | None = None,
) -> DataFrame:
    """As-of join: every left row gains the right row with the greatest
    ``right_ts <= left_ts`` for its key (inclusive match at equal
    timestamps), as ``asof_<col>`` columns — NULL when no right row
    precedes. ``tolerance_minutes`` optionally voids matches older than
    the horizon (pandas merge_asof semantics).

    Right-side ties on (key, ts) must be pre-deduplicated by the caller
    (one row per key+ts) for deterministic output.

    Plan shape: union the tagged sides, one window over the keys ordered
    by (ts, side) with right rows sorting before left at equal ts, carry
    right values with last(ignoreNulls). Linear work, single shuffle,
    no per-key blow-up."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        F.struct(*[c for c in left.columns]).alias("_l"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("_r_ts"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *key_cols,
        "_side",
        "_l",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    ).where(F.col("_side") == 1)
    matched: Column = F.col("asof_ts").isNotNull()
    if tolerance_minutes is not None:
        matched = matched & (
            F.col("_l")[left_ts]
            <= F.col("asof_ts") + F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
        )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    return carried.select(
        *out_cols,
        F.when(matched, F.col("asof_ts")).alias(f"asof_{right_ts}"),
        *[
            F.when(matched, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
