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


def test_sql_script_report_equals_dataframe_pipeline(spark):
    """S10: the report executed from the translated .sql file
    (sources/sqlscript.py over sql/rep_fraud_sync.sql, native
    OR-EXISTS included) must equal the DataFrame pipeline row for row —
    the reference runs this report as a script (database.py:42-46,
    etl.py:411), so both authoring surfaces are first-class."""
    from etl_fraud_detection_spark.sources.sqlscript import report_from_sql_script

    t = FD.fraud_tables(spark)
    empty_report = spark.createDataFrame([], schema="report_dt date")
    now = F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")
    df_out = fraud.fraud_report(
        t["ff_transactions"], t["ff_cards_hist"], t["ff_accounts_hist"],
        t["ff_clients_hist"], t["ff_terminals_hist"], t["ff_blacklist"],
        empty_report, now,
    )
    sql_out = report_from_sql_script(
        spark,
        {
            "fact_transaction": t["ff_transactions"],
            "dim_cards_hist": t["ff_cards_hist"],
            "dim_accounts_hist": t["ff_accounts_hist"],
            "dim_clients_hist": t["ff_clients_hist"],
            "dim_terminals_hist": t["ff_terminals_hist"],
            "fact_passport_blacklist": t["ff_blacklist"],
        },
        empty_report,
        "2025-01-15 12:00:00",
    )
    assert sql_out.columns == df_out.columns
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, sql_out.collect())) == sorted(map(key, df_out.collect()))
