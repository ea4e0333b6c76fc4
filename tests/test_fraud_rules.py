"""Golden tests for the four fraud rules, incl. strict-bound negatives
(FIXTURES.md A8). Fixture expectations: TX11/TX20 -> rule 1, TX30 ->
rule 2, TX41 -> rule 3, TX53 -> rule 4; boundary rows TX12/TX21/TX31/
TX71/TX63 must NOT fire."""

from pyspark.sql import functions as F

from etl_fraud_detection_spark.plans import fraud, fraud_domain as FD


def _report(spark):
    t = FD.fraud_tables(spark)
    empty_report = spark.createDataFrame([], schema="report_dt date")
    now = F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")
    return fraud.fraud_report(
        t["ff_transactions"], t["ff_cards_hist"], t["ff_accounts_hist"],
        t["ff_clients_hist"], t["ff_terminals_hist"], t["ff_blacklist"],
        empty_report, now,
    )


def test_fraud_report_golden(spark):
    rows = _report(spark).collect()
    got = sorted((r["event_type"], r["passport"]) for r in rows)
    assert got == [(1, "P1"), (1, "P2"), (2, "P3"), (3, "P4"), (4, "P5")]
    by_pass = {r["passport"]: r for r in rows}
    # CONCAT_WS skips NULL patronymic (reference main.ddl:164 nullable)
    assert by_pass["P3"]["fio"] == "Pyotr Sidorov"
    assert by_pass["P1"]["fio"] == "Ivan Petrov Sergeevich"
    # report_dt = CAST(create_dt AS DATE)
    assert str(by_pass["P5"]["report_dt"]) == "2025-01-10"


def test_report_watermark_monotone(spark):
    """Re-running mart_update with the report already containing the
    batch adds nothing (reference sql:22-24 monotonicity)."""
    t = FD.fraud_tables(spark)
    now = F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")
    existing = spark.createDataFrame([("2025-01-10",)], "report_dt string").select(
        F.col("report_dt").cast("date")
    )
    out = fraud.fraud_report(
        t["ff_transactions"], t["ff_cards_hist"], t["ff_accounts_hist"],
        t["ff_clients_hist"], t["ff_terminals_hist"], t["ff_blacklist"],
        existing, now,
    )
    assert out.count() == 0
