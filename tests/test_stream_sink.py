"""Exactly-once streaming -> warehouse delivery across restarts.

Simulates the two failure modes a production stream hits:
1. restart mid-replay (checkpoint resume must not re-deliver or skip);
2. micro-batch redelivery (crash after data write, before checkpoint
   commit) — the idempotent partition-overwrite write must not
   duplicate.
"""

import os
import shutil

from pyspark.sql import functions as F

from etl_fraud_detection_spark.streaming.sink import (
    idempotent_batch_writer,
    run_events_to_warehouse,
)

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, props string"
)


def _split_events(spark, src_dir: str, n_files: int = 4):
    """Write the events table as n separate parquet files."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "props"
    )
    parts = df.randomSplit([1.0] * n_files, seed=7)
    paths = []
    for i, p in enumerate(parts):
        path = os.path.join(src_dir, f"part{i}.parquet")
        p.coalesce(1).write.mode("overwrite").parquet(path + ".dir")
        data_file = [
            f for f in os.listdir(path + ".dir") if f.endswith(".parquet")
        ][0]
        shutil.move(os.path.join(path + ".dir", data_file), path)
        shutil.rmtree(path + ".dir")
        paths.append(path)
    return paths


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    files = _split_events(spark, str(src))

    # run 1 sees only the first two files (the rest wait OUTSIDE the
    # source dir — the file source globs everything in it); "crash" =
    # query ends
    held = str(tmp_path / "held")
    os.mkdir(held)
    hidden = [os.path.join(held, os.path.basename(f)) for f in files[2:]]
    os.rename(files[2], hidden[0])
    os.rename(files[3], hidden[1])
    run_events_to_warehouse(spark, str(src), tgt, ckpt, SCHEMA)
    n_first = spark.read.parquet(tgt).count()
    assert n_first > 0

    # restart with the remaining files now visible, SAME checkpoint
    os.rename(hidden[0], files[2])
    os.rename(hidden[1], files[3])
    run_events_to_warehouse(spark, str(src), tgt, ckpt, SCHEMA)

    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    out = spark.read.parquet(tgt)
    assert out.count() == total  # nothing lost, nothing doubled
    assert out.select("event_id").distinct().count() == total

    # a third run with no new files must change nothing
    run_events_to_warehouse(spark, str(src), tgt, ckpt, SCHEMA)
    assert spark.read.parquet(tgt).count() == total


def test_batch_redelivery_overwrites_not_appends(spark, tmp_path):
    tgt = str(tmp_path / "tgt2")
    writer = idempotent_batch_writer(tgt)
    batch = spark.range(10).select(F.col("id").alias("event_id"))
    writer(batch, 0)
    writer(batch, 1)
    assert spark.read.parquet(tgt).count() == 20
    # redeliver batch 1 (crash-after-write replay) — count must not grow
    writer(batch, 1)
    assert spark.read.parquet(tgt).count() == 20
    # and a redelivery carrying a corrected subset replaces, not appends
    writer(batch.limit(4), 1)
    assert spark.read.parquet(tgt).count() == 14
