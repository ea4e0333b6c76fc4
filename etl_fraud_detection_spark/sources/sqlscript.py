"""SQL-script execution (S10): run a report from a ``.sql`` file, the
way the reference does (reference database.py:42-46 reads the script
with utf-8-sig and executes it; etl.py:411 drives the report from
``trsh_rep_fraud_sync.sql``) — here the script text becomes a Spark SQL
query over registered temp views, with named parameters replacing the
reference's NOW() for deterministic replays.

Spark-first: the script goes through the same Catalyst pipeline as the
DataFrame plans — same pushdown, same broadcast decisions — so SQL-file
authoring and API authoring are interchangeable (asserted equal in
tests/test_fraud_rules.py)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SQL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sql")


def get_script(path: str) -> str:
    """Read a SQL script (utf-8-sig: reference scripts carry a BOM)."""
    with open(path, encoding="utf-8-sig") as fh:
        return fh.read()


def run_script(
    spark: SparkSession,
    path: str,
    views: dict[str, DataFrame] | None = None,
    args: dict | None = None,
    broadcast: tuple[str, ...] = (),
) -> DataFrame:
    """Execute one SQL script: register ``views`` as temp views, strip
    the trailing statement terminator, run via ``spark.sql`` with named
    parameters (``:name`` markers in the script).

    ``broadcast`` names views to register with a broadcast hint — the
    engine-layer knob that keeps dimension joins off the sort-merge
    path WITHOUT polluting the user's script with pragmas (the hint
    rides the view's logical plan into every use inside the script)."""
    for name, df in (views or {}).items():
        if name in broadcast:
            df = df.hint("broadcast")
        df.createOrReplaceTempView(name)
    sql = get_script(path).strip().rstrip(";")
    return spark.sql(sql, args=args or {})


def report_from_sql_script(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    report: DataFrame,
    processed_dt: str,
) -> DataFrame:
    """The fraud-report increment from the translated reference script
    (sql/rep_fraud_sync.sql) — the S10 twin of plans.fraud.fraud_report.
    ``tables`` maps the warehouse view names (fact_transaction,
    dim_*_hist, fact_passport_blacklist) to DataFrames."""
    views = dict(tables)
    views["rep_fraud"] = report
    dims = tuple(n for n in views if n != "fact_transaction")
    return run_script(
        spark,
        os.path.join(SQL_DIR, "rep_fraud_sync.sql"),
        views=views,
        args={"processed_dt": processed_dt},
        broadcast=dims,
    )
