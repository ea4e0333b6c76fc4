"""Streaming CDC apply: a change stream upserted into the warehouse
through foreachBatch + the batch SCD1 merge — the streaming twin of the
reference's daily dimension load. The final dimension state must equal
applying the same batches in order through the batch path.
"""

import os
from datetime import datetime

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators.scd import scd1_merge
from etl_fraud_detection_spark.pipeline import Warehouse

KEYS = ["acct"]
COLS = ["acct", "city"]
SCHEMA = "acct string, city string, create_dt timestamp_ntz"


def _batch(spark, rows):
    return spark.createDataFrame(
        [(a, c, datetime(2025, 1, d)) for a, c, d in rows], SCHEMA
    )


def test_stream_scd1_apply_equals_batch_replay(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    now = F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")

    # seed dimension
    seed = _batch(spark, [("A1", "Moscow", 1), ("A2", "Kazan", 1)]).select(
        *COLS, "create_dt",
        F.lit(None).cast("timestamp_ntz").alias("update_dt"),
        F.expr("TIMESTAMP_NTZ '2025-01-01 00:00:00'").alias("processed_dt"),
    )
    wh.overwrite("dwh", "accounts", seed)

    # a 3-batch change stream: update, insert, no-op re-send
    batches = [
        _batch(spark, [("A1", "Tver", 2)]),                    # update A1
        _batch(spark, [("A3", "Omsk", 3)]),                    # insert A3
        _batch(spark, [("A1", "Tver", 2), ("A2", "Kazan", 1)]),  # no-op
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(batches):
        # one FILE per batch at the top level (the file source ignores
        # non-partition subdirectories)
        tmp_dir = os.path.join(str(tmp_path), f"b{i}.dir")
        b.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        part = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp_dir, part), os.path.join(src, f"b{i}.parquet"))

    def apply_batch(batch_df, batch_id):
        dwh = wh.read("dwh", "accounts")
        wh.overwrite("dwh", "accounts", scd1_merge(dwh, batch_df, KEYS, COLS, now=now))

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch replay over the same deltas
    expect = seed
    for b in batches:
        expect = scd1_merge(expect, b, KEYS, COLS, now=now)

    got = sorted(
        map(tuple, wh.read("dwh", "accounts").select(*COLS, "update_dt").collect())
    )
    want = sorted(map(tuple, expect.select(*COLS, "update_dt").collect()))
    assert got == want
    assert len(got) == 3  # A1 updated, A2 untouched, A3 inserted
