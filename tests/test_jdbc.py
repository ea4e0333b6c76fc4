"""JDBC source integration tests against embedded Apache Derby (ships
in the PySpark jars directory — no external database needed).

Covers the reference's live-database path (etl.py:190-209,
database.py:49-68): the watermark predicate must execute inside the
source database (it is part of the JDBCRelation's subquery, visible in
the physical plan), Spark-side residual filters must still reach the
scan as PushedFilters, and the pipeline's ingest_database must land
the delta in staging and the warehouse with the watermark advanced.
"""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_fraud_detection_spark.sources import jdbc as jsrc

URL = "jdbc:derby:memory:etljdbc;create=true"


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def derby(spark):
    """Seed an in-memory Derby database through the driver JVM."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE clients (client_id VARCHAR(16), last_name VARCHAR(64),"
        " first_name VARCHAR(64), patronymic VARCHAR(64),"
        " date_of_birth TIMESTAMP, passport_num VARCHAR(16),"
        " passport_valid_to TIMESTAMP, phone VARCHAR(32),"
        " create_dt TIMESTAMP, update_dt TIMESTAMP)"
    )
    rows = [
        # loaded long ago (before the watermark) — must NOT cross the wire
        "('c1','Old','Anna',NULL,TIMESTAMP('1980-01-01 00:00:00'),'P100',"
        "TIMESTAMP('2030-01-01 00:00:00'),'+7 100',TIMESTAMP('2023-12-30 10:00:00'),NULL)",
        # new row (create_dt after watermark)
        "('c2','New','Boris',NULL,TIMESTAMP('1985-05-05 00:00:00'),'P200',"
        "TIMESTAMP('2031-01-01 00:00:00'),'+7 200',TIMESTAMP('2024-01-02 09:00:00'),NULL)",
        # old row updated after the watermark (COALESCE picks update_dt)
        "('c3','Upd','Vera',NULL,TIMESTAMP('1990-09-09 00:00:00'),'P300',"
        "TIMESTAMP('2032-01-01 00:00:00'),'+7 300',TIMESTAMP('2023-11-01 08:00:00'),"
        "TIMESTAMP('2024-01-02 11:30:00'))",
    ]
    for r in rows:
        st.executeUpdate(f"INSERT INTO clients VALUES {r}")
    st.close()
    conn.close()
    return URL


WM = datetime(2024, 1, 1, 0, 0, 0)
CLIENT_COLS = ("client_id", "last_name", "first_name", "patronymic",
               "date_of_birth", "passport_num", "passport_valid_to", "phone")


def test_incremental_filter_runs_in_source_db(spark, derby):
    df = jsrc.read_incremental(
        spark, derby, "clients", CLIENT_COLS, WM, ts_literal=jsrc.derby_ts
    )
    got = {r["client_id"]: r for r in df.collect()}
    assert set(got) == {"c2", "c3"}  # c1 predates the watermark
    # c3's effective change timestamp is its update_dt
    assert got["c3"]["create_dt"] == datetime(2024, 1, 2, 11, 30)
    # the watermark predicate is part of the source-side subquery, i.e.
    # visible inside the JDBCRelation, not as a Spark Filter node
    p = _plan(df)
    assert "JDBCRelation" in p
    assert "COALESCE(update_dt, create_dt) > TIMESTAMP('2024-01-01 00:00:00')" in p


def test_spark_residual_filter_pushes_down(spark, derby):
    df = jsrc.read_incremental(
        spark, derby, "clients", CLIENT_COLS, WM, ts_literal=jsrc.derby_ts
    ).where(F.col("client_id") == "c2")
    p = _plan(df)
    pushed = p.split("PushedFilters:")[1].splitlines()[0]
    assert "client_id" in pushed.lower()  # Derby folds identifiers to upper
    assert [r["client_id"] for r in df.collect()] == ["c2"]


def test_partitioned_parallel_extract(spark, derby):
    df = jsrc.read_incremental(
        spark, derby, "clients", CLIENT_COLS, WM, ts_literal=jsrc.derby_ts,
        partition_column="create_dt",
        lower_bound="2023-01-01 00:00:00", upper_bound="2025-01-01 00:00:00",
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert {r["client_id"] for r in df.collect()} == {"c2", "c3"}


def test_read_keys_ships_keys_only(spark, derby):
    keys = jsrc.read_keys(spark, derby, "clients", ("client_id",))
    assert keys.columns == ["client_id"]
    assert {r["client_id"] for r in keys.collect()} == {"c1", "c2", "c3"}


def test_ingest_database_end_to_end(spark, derby, tmp_path):
    from etl_fraud_detection_spark.pipeline import RunLog, Warehouse, WatermarkStore, ingest_database
    from etl_fraud_detection_spark.state import EPOCH

    wh = Warehouse(spark, str(tmp_path))
    wm = WatermarkStore(os.path.join(str(tmp_path), "meta", "watermarks.json"))
    log = RunLog(spark, os.path.join(str(tmp_path), "meta", "run_log"))
    wm.advance("clients", WM)
    now = F.lit("2024-01-03 00:00:00").cast("timestamp_ntz")
    today = F.lit("2024-01-03 00:00:00").cast("timestamp_ntz")
    ingest_database(
        spark, wh, wm, log, "clients", derby, "clients", run_id=1,
        ts_literal=jsrc.derby_ts, now=now, today=today,
    )
    dwh = wh.read("dwh", "dim_clients_hist")
    cur = dwh.where(F.col("effective_to") > F.lit("2500-01-01").cast("timestamp_ntz"))
    # delete detection saw c1 in the key snapshot, so only c2/c3 are
    # current (c1 was never in dwh to begin with)
    assert {r["client_id"] for r in cur.collect()} == {"c2", "c3"}
    # watermark advanced to the max extracted change timestamp
    assert wm.get("clients") == datetime(2024, 1, 2, 11, 30)
    assert wm.get("clients") > EPOCH
