"""Unit tests for sessionization, as-of join, salted join, and the
KMeans-quantizer IVF variant."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators.joins import salted_join
from etl_fraud_detection_spark.operators.temporal import asof_join, sessionize


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )


def ts(h, m=0, s=0):
    return datetime(2025, 1, 1, h, m, s)


def test_sessionize_gap_boundary(spark):
    e = ev(
        spark,
        [
            (1, 7, ts(10, 0)),
            (2, 7, ts(10, 30)),      # exactly 30 min: SAME session (strict >)
            (3, 7, ts(11, 0, 1)),    # 30 min + 1 s: new session
            (4, 8, ts(10, 0)),       # other user: own numbering
        ],
    )
    out = {r.event_id: r.session_seq for r in sessionize(e, ["user_id"]).collect()}
    assert out[1] == out[2] == 1
    assert out[3] == 2
    assert out[4] == 1


def test_asof_join_inclusive_and_unmatched(spark):
    left = ev(spark, [(1, 7, ts(10, 0)), (2, 7, ts(12, 0)), (3, 9, ts(10, 0))])
    right = spark.createDataFrame(
        [(7, ts(10, 0), 100.0), (7, ts(11, 0), 200.0), (8, ts(9, 0), 300.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, ["user_id"], right_value_cols=["value"]
        ).collect()
    }
    assert out[1].asof_ts == ts(10, 0) and out[1].asof_value == 100.0  # inclusive
    assert out[2].asof_ts == ts(11, 0) and out[2].asof_value == 200.0  # latest
    assert out[3].asof_ts is None and out[3].asof_value is None  # no right rows


def test_asof_join_tolerance(spark):
    left = ev(spark, [(1, 7, ts(12, 0))])
    right = spark.createDataFrame(
        [(7, ts(10, 0), 1.0)], "user_id long, ts timestamp_ntz, value double"
    )
    hit = asof_join(left, right, ["user_id"], right_value_cols=["value"],
                    tolerance_minutes=180).collect()[0]
    miss = asof_join(left, right, ["user_id"], right_value_cols=["value"],
                     tolerance_minutes=60).collect()[0]
    assert hit.asof_value == 1.0
    assert miss.asof_value is None and miss.asof_ts is None


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share key 1 (hot key); result must equal plain join.
    big = spark.createDataFrame(
        [(i, 1 if i % 10 else 2) for i in range(500)], "row_id long, k long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "miss")], "k long, name string")
    salted = salted_join(big, small, ["k"], salt_source=F.col("row_id"), n_salt=8)
    plain = big.join(small, ["k"])
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_range_join_binned_boundaries(spark):
    from etl_fraud_detection_spark.operators.joins import range_join_binned

    events = spark.createDataFrame(
        [(1, ts(10, 0)), (2, ts(10, 59, 59)), (3, ts(11, 0)), (4, ts(9, 59, 59))],
        "event_id long, ts timestamp_ntz",
    )
    # interval [10:00, 11:00) spans one bin; [9:30, 11:30) spans three
    iv = spark.createDataFrame(
        [(ts(10, 0), ts(11, 0), "a"), (ts(9, 30), ts(11, 30), "b")],
        "start timestamp_ntz, end timestamp_ntz, tag string",
    )
    out = sorted(
        (r.event_id, r.tag)
        for r in range_join_binned(events, iv, bin_seconds=3600).collect()
    )
    # start inclusive, end exclusive; event 3 misses 'a' but hits 'b'
    assert out == [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (4, "b")]


def test_kmeans_ivf_schema_and_recall(spark):
    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cen = similarity.kmeans_centroids(emb, n_centroids=4, max_iter=5)
    approx = similarity.ivf_topk(emb, k=3, query_pred="vec_id < 20", centroids=cen)
    exact = similarity.brute_force_topk(emb, k=3, query_pred="vec_id < 20")
    assert approx.columns == exact.columns
    a = {(r.query_id, r.cand_id) for r in approx.collect()}
    e = {(r.query_id, r.cand_id) for r in exact.collect()}
    assert len(a) > 0
    # nprobe=1 IVF recall against exact top-3: loose floor, seeded so stable
    r1 = len(a & e) / len(e)
    assert r1 >= 0.2
    # nprobe=2 probes a strict superset of cells -> recall never drops
    two = similarity.ivf_topk(
        emb, k=3, query_pred="vec_id < 20", centroids=cen, nprobe=2
    )
    a2 = {(r.query_id, r.cand_id) for r in two.collect()}
    assert len(a2 & e) / len(e) >= r1


def test_resample_ffill_gapfill_and_ties(spark):
    from etl_fraud_detection_spark.operators.temporal import resample_ffill

    rows = [
        # user 1: events at 00:30, 00:45 (tie instant via two event_ids
        # at 03:00), then silence until 06:10
        (1, 1, ts(0, 30), 10.0),
        (2, 1, ts(0, 45), 20.0),
        (3, 1, ts(3, 0), 30.0),
        (4, 1, ts(3, 0), 40.0),  # same instant, higher event_id wins
        (5, 1, ts(6, 10), 50.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        r.slot_ts: (r.asof_ts, r.asof_value)
        for r in resample_ffill(e, ["user_id"], interval="1 HOUR").collect()
    }
    # grid: 00:00 .. 06:00 hourly = 7 slots
    assert len(out) == 7
    assert out[ts(0)] == (None, None)          # before first observation
    assert out[ts(1)] == (ts(0, 45), 20.0)     # latest at-or-before 01:00
    assert out[ts(2)] == (ts(0, 45), 20.0)     # gap forward-fills
    assert out[ts(3)] == (ts(3, 0), 40.0)      # tie -> max event_id
    assert out[ts(6)] == (ts(3, 0), 40.0)      # 06:10 is after the slot
