"""Streaming stateful operators vs their batch twins on UNORDERED input.

The round-1 versions of rules 3/4 and the as-of enrichment assumed
per-key event-time-ordered arrival (true for a single-file replay,
silently wrong on a real stream). The watermark-ordered replay harness
(streaming/rules.py:_ordered_replay_fn) buffers per-key events in state
and applies the lag logic only to watermark-released events; these
tests replay the events table *shuffled across multiple micro-batches*
and require the exact batch answer.
"""

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window, functions as F

from etl_fraud_detection_spark.catalog import load_table
from etl_fraud_detection_spark.streaming import rules as sr

SF_DIR = "/root/testdata/sf0.001"
# disorder spans the whole replay, so the tolerated lateness must too
DELAY = "3650 days"


@pytest.fixture(scope="module")
def shuffled_dir(tmp_path_factory):
    """events.parquet deterministically shuffled and split into 3 files
    (one micro-batch each, maxFilesPerTrigger=1), heartbeat last. Every
    batch spans the full time range, so per-key arrival order across
    batches is thoroughly violated."""
    d = str(tmp_path_factory.mktemp("shuffled_events"))
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    n = t.num_rows
    perm = sorted(range(n), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    chunks = [perm[k::3] for k in range(3)]
    now = time.time()
    for k, idx in enumerate(chunks):
        p = os.path.join(d, f"part{k}.parquet")
        pq.write_table(t.take(idx), p)
        os.utime(p, (now + k, now + k))
    hb = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([4102444800 * 10**9], pa.int64()).cast(
                pa.timestamp("ns")
            ),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["heartbeat"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([""], pa.string()),
        }
    ).cast(t.schema)
    hb_path = os.path.join(d, "heartbeat.parquet")
    pq.write_table(hb, hb_path)
    os.utime(hb_path, (now + 10, now + 10))
    return d


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_rule3_stream_matches_batch_on_shuffled_input(spark, shuffled_dir):
    got = sr.rule3_city_hop_stream(
        spark, SF_DIR, delay=DELAY, events_dir=shuffled_dir
    )
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exp = (
        ev.select(
            "event_id", "user_id", "ts", "event_type",
            F.lag("event_type").over(w).alias("prv_type"),
            F.lag("ts").over(w).alias("prv_ts"),
        )
        .where(
            (F.col("event_type") != F.col("prv_type"))
            & (F.col("ts") < F.col("prv_ts") + F.expr("INTERVAL 1 HOUR"))
        )
    )
    cols = ["event_id", "user_id", "ts", "event_type", "prv_type", "prv_ts"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_asof_stream_matches_batch_on_shuffled_input(spark, shuffled_dir):
    got = sr.asof_enrich_stream(spark, SF_DIR, delay=DELAY, events_dir=shuffled_dir)
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    right = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    from etl_fraud_detection_spark.operators.temporal import asof_join

    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    exp = asof_join(
        left, right, ["user_id"], right_value_cols=["event_id", "value"]
    ).where(F.col("asof_ts").isNotNull())
    cols = ["event_id", "user_id", "ts", "asof_ts", "asof_event_id", "asof_value"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_rule4_stream_matches_batch_on_shuffled_input(spark, shuffled_dir):
    got = sr.rule4_amount_guess_stream(
        spark, SF_DIR, delay=DELAY, events_dir=shuffled_dir
    )
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    inner = ev.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.lag("value").over(w).alias("prv_value"),
        F.min("ts").over(w.rowsBetween(-3, -1)).alias("min_ts"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w.rowsBetween(-3, -1))
        .alias("oper"),
    ).select(
        "*",
        F.min(F.when(F.col("value") < F.col("prv_value"), 1).otherwise(0))
        .over(w.rowsBetween(-1, 0))
        .alias("reducion"),
    )
    exp = inner.where(
        (F.col("event_type") == "purchase")
        & (F.col("oper") >= 2)
        & (F.col("ts") < F.col("min_ts") + F.expr("INTERVAL 12 HOURS"))
        & (F.col("reducion") == 1)
    )
    cols = ["event_id", "user_id", "ts", "value", "min_ts"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_stream_stream_join_matches_batch(spark):
    """The watermarked stream-stream interval join must equal the batch
    interval join over the same events table."""
    out = sr.stream_stream_click_purchase_join(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"), F.col("value").alias("click_value"),
    )
    batch = p.join(
        c,
        (p.user_id == c.cu)
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "click_value")
    key = lambda r: (r.purchase_id, r.click_id)  # noqa: E731
    got = sorted(map(key, out.collect()))
    want = sorted(map(key, batch.collect()))
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_join_flushes_null_side(spark):
    """The LEFT OUTER stream-stream join must emit clickless purchases
    with NULL click columns (flushed by the heartbeat watermark), and
    match the batch left join exactly."""
    out = sr.stream_stream_left_outer_join(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"), F.col("value").alias("click_value"),
    )
    batch = p.join(
        c,
        (p.user_id == c.cu)
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "left",
    ).select("purchase_id", "click_id")
    key = lambda r: (r.purchase_id, r.click_id)  # noqa: E731
    got = sorted(map(key, out.collect()))
    want = sorted(map(key, batch.collect()))
    assert got == want and len(got) > 0
    # the outer rows are the point: some purchases must be clickless
    assert any(k[1] is None for k in got)
