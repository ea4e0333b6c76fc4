"""The four fraud rules, Spark-first.

Reference semantics: /root/reference/trsh_rep_fraud_sync.sql:1-129 — four
temporal-join + window pipelines UNION ALL'd into an accumulating report.
This module holds (a) analogs of rules 3/4 over the driver's ``events``
table (user_id≈client, event_type≈city/oper, value≈amount, ts≈trans_date)
used as scale-bearing flagship queries, and (b) the full-fidelity rules
over fraud-domain frames (plans/fraud_domain.py builds those inputs).

Scale notes: every window below shares one (partition, order) spec per
rule so Spark computes all frame aggregates in a single Window exec after
one shuffle. The events analogs run scan→window→filter→project: no join,
one shuffle, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Deterministic window order: ts then event_id tiebreak (matches the
# DuckDB oracle's ORDER BY ts, event_id).
_BY_USER = lambda: Window.partitionBy("user_id").orderBy("ts", "event_id")  # noqa: E731


def rule3_city_hop_events(events: DataFrame) -> DataFrame:
    """Rule-3 analog (reference sql:46-80): same user, different
    event_type within < 1 hour of the previous event.

    LAG(city)/LAG(date) per client + strict ``ts < prv_ts + 1h``
    (reference sql:63-64, 76-77).
    """
    w = _BY_USER()
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prv_type"),
            F.lag("ts").over(w).alias("prv_ts"),
        )
        .where(
            (F.col("event_type") != F.col("prv_type"))
            & (F.col("ts") < F.col("prv_ts") + F.expr("INTERVAL 1 HOUR"))
        )
    )


def rule4_amount_guessing_events(events: DataFrame) -> DataFrame:
    """Rule-4 analog (reference sql:82-129): amount-guessing.

    Per user ordered by ts: repeated prior 'error' events with
    decreasing value, then a 'purchase' with a smaller value, within a
    bounded interval of the window start. Mirrors the reference's layered
    windows: LAG(amt) (sql:110), MIN(trans_date) over rows -3..-1
    (sql:111), SUM(CASE rejected) over rows -3..-1 (sql:112), and the
    outer MIN(decrease-flag) frame (sql:95). Constants are loosened
    (>=2 errors, 12h, decrease frame -1..0) so the pattern fires on the
    driver's random event stream; the reference's exact strict constants
    are exercised by q_fraud4 on controlled fixtures.
    """
    w = _BY_USER()
    staged = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.lag("value").over(w).alias("prv_value"),
        F.min("ts").over(w.rowsBetween(-3, -1)).alias("min_ts"),
        F.sum(
            F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(0))
        )
        .over(w.rowsBetween(-3, -1))
        .alias("oper"),
    )
    w2 = _BY_USER()
    flagged = staged.select(
        "*",
        F.min(
            F.when(F.col("value") < F.col("prv_value"), F.lit(1)).otherwise(F.lit(0))
        )
        .over(w2.rowsBetween(-1, 0))
        .alias("reducion"),
    )
    return flagged.where(
        (F.col("event_type") == "purchase")
        & (F.col("oper") >= 2)
        & (F.col("ts") < F.col("min_ts") + F.expr("INTERVAL 12 HOURS"))
        & (F.col("reducion") == 1)
    ).select("event_id", "user_id", "ts", "value", "min_ts")
