"""Event-flow analytics: funnel progression and cohort retention.

The classic product-analytics pair over an event stream (reference
parity target: the events table introduced for the training-data
extensions; the fraud reference has no funnel/retention surface, so
these are catalog extensions in the same style as sessionization —
see operators/temporal.py).

Scale notes (100 TB events):
- Funnel is ONE shuffle on the user key: every step's "earliest
  qualifying timestamp" is a MIN-over-partition window, and the
  chained step windows all share the same partition spec, so Catalyst
  plans a single Exchange with N Window nodes. The final per-user
  reduce reuses the same key, so no second shuffle.
- Retention is the same user-key shuffle for the first-event window,
  then one aggregation shuffle on (cohort, offset) — both keys are
  low-cardinality-safe because the distinct-user count is two-phase
  (partial de-dup map-side).
- Neither operator ever materializes per-user event arrays; state is
  O(1) columns per row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    deadline_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel progression per user: step ``i+1`` counts only if
    it happens strictly after step ``i`` and within ``deadline_hours``
    of it (the conversion deadline). Emits one row per user with the
    timestamp reached at every step (NULL once the funnel is dropped)
    and ``reached`` = number of completed steps.

    Each step's earliest-qualifying event is a MIN-over-user window
    conditioned on the previous step's window result — all windows
    share the user partition key, so the whole funnel is one shuffle
    regardless of the number of steps."""
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    for i, step in enumerate(steps, 1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = (
                cond
                & (F.col(ts_col) > F.col(prev))
                & (
                    F.col(ts_col)
                    <= F.col(prev) + F.expr(f"INTERVAL {deadline_hours} HOURS")
                )
            )
        df = df.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"_t{i}"
    out = df.groupBy(user_col).agg(
        *[F.min(f"_t{i}").alias(f"step{i}_ts") for i in range(1, len(steps) + 1)]
    )
    reached = F.lit(0)
    for i in range(1, len(steps) + 1):
        reached = F.when(F.col(f"step{i}_ts").isNotNull(), i).otherwise(reached)
    return out.withColumn("reached", reached.cast("long"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the ISO
    week of their first event; each (cohort_week, week_offset) cell
    counts the distinct users of that cohort active in that week.

    First-event assignment is a MIN-over-user window (one shuffle);
    the matrix is a single two-phase COUNT(DISTINCT user) aggregation
    — the map-side partial de-dups (user, cohort, week) before the
    cell-key shuffle, so hot cells never receive duplicate rows."""
    w = Window.partitionBy(user_col)
    base = events.select(user_col, ts_col).select(
        F.col(user_col),
        F.date_trunc("week", F.min(ts_col).over(w)).cast("date").alias("cohort_week"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
    )
    return (
        base.groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
