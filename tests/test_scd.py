"""Golden tests for the SCD engine (SURVEY.md §5.2 checklist)."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators.scd import scd1_merge, scd2_merge
from etl_fraud_detection_spark.plans import fixtures as FX

def NOW():
    return F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")


def TODAY():
    return F.expr("TIMESTAMP_NTZ '2025-01-10 00:00:00'")


def _scd1(spark):
    dwh = FX.spark_df(spark, FX.SCD1_DWH_ROWS, FX.SCD1_DWH_COLS, FX.SCD1_DWH_TYPES)
    stg = FX.spark_df(spark, FX.SCD1_STG_ROWS, FX.SCD1_STG_COLS, FX.SCD1_STG_TYPES)
    return scd1_merge(dwh, stg, FX.SCD1_KEYS, FX.SCD1_COLS, now=NOW())


def _scd2(spark, dwh=None):
    if dwh is None:
        dwh = FX.spark_df(spark, FX.SCD2_DWH_ROWS, FX.SCD2_DWH_COLS, FX.SCD2_DWH_TYPES)
    stg = FX.spark_df(spark, FX.SCD2_STG_ROWS, FX.SCD2_STG_COLS, FX.SCD2_STG_TYPES)
    srck = FX.spark_df(
        spark, FX.SCD2_SRC_KEYS_ROWS, FX.SCD2_SRC_KEYS_COLS, FX.SCD2_SRC_KEYS_TYPES
    )
    return scd2_merge(
        dwh, stg, FX.SCD2_KEYS, FX.SCD2_COLS, src_keys=srck, now=NOW(), today=TODAY()
    )


def test_scd1_semantics(spark):
    rows = {r["trans_id"]: r for r in _scd1(spark).collect()}
    assert len(rows) == 6
    # unchanged row: no update stamp
    assert rows["T1"]["update_dt"] is None and rows["T1"]["amt"] == 100.0
    # changed row: new value, update_dt = batch date
    assert rows["T2"]["amt"] == 250.0 and rows["T2"]["update_dt"] == FX.BATCH
    # NULL -> value MUST trigger (the <=> semantic, reference etl.py:403-405)
    assert rows["T3"]["amt"] == 300.0 and rows["T3"]["update_dt"] == FX.BATCH
    # value -> NULL MUST trigger
    assert rows["T4"]["card_num"] is None and rows["T4"]["update_dt"] == FX.BATCH
    # key absent from stg: untouched
    assert rows["T5"]["amt"] == 500.0 and rows["T5"]["update_dt"] is None
    # new key: inserted with create_dt = batch date, update_dt NULL
    assert rows["T6"]["create_dt"] == FX.BATCH and rows["T6"]["update_dt"] is None


def test_scd2_semantics(spark):
    out = _scd2(spark).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["client_id"], []).append(r)
    for v in by_key.values():
        v.sort(key=lambda r: r["effective_from"])

    close_1s = datetime(2025, 1, 9, 23, 59, 59)  # BATCH - 1 second

    # K1 changed: history + closed-at-create_dt-1s + new live version
    k1 = by_key["K1"]
    assert len(k1) == 3
    assert k1[1]["effective_to"] == close_1s and k1[1]["phone"] == "111"
    assert k1[2]["phone"] == "119" and k1[2]["effective_to"] == FX.SENTINEL
    assert not k1[2]["deleted_flg"]

    # K2 unchanged: single untouched version
    k2 = by_key["K2"]
    assert len(k2) == 1 and k2[0]["effective_to"] == FX.SENTINEL
    assert k2[0]["processed_dt"] != datetime(2025, 1, 15, 12)

    # K3 vanished: closed at today-1s + tombstone (deleted_flg TRUE, open-ended)
    k3 = by_key["K3"]
    assert len(k3) == 2
    assert k3[0]["effective_to"] == close_1s and not k3[0]["deleted_flg"]
    assert k3[1]["deleted_flg"] and k3[1]["effective_to"] == FX.SENTINEL
    assert k3[1]["effective_from"] == FX.TODAY

    # K4 reappearing: tombstone closed + new live version
    k4 = by_key["K4"]
    assert len(k4) == 2
    assert k4[0]["deleted_flg"] and k4[0]["effective_to"] == close_1s
    assert not k4[1]["deleted_flg"] and k4[1]["effective_to"] == FX.SENTINEL

    # K5 new key: single live version
    k5 = by_key["K5"]
    assert len(k5) == 1 and k5[0]["effective_from"] == FX.BATCH

    # K6 NULL == NULL: unchanged (no spurious version)
    assert len(by_key["K6"]) == 1

    # K7 value -> NULL MUST version
    k7 = by_key["K7"]
    assert len(k7) == 2 and k7[1]["phone"] is None


def test_scd2_idempotent_rerun(spark):
    """Re-running the same batch adds nothing (reference M6 guard +
    change detection make re-runs no-ops)."""
    first = _scd2(spark)
    first_rows = sorted(repr(tuple(r)) for r in first.collect())
    second = _scd2(spark, dwh=first)
    second_rows = sorted(repr(tuple(r)) for r in second.collect())
    assert first_rows == second_rows
