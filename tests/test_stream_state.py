"""Scale evidence for the stream-stream interval join: the join state
must be WATERMARK-BOUNDED, not O(stream history).

The batch-shape analog of tests/test_plans.py's pinned physical plans:
replay the events table in time-ordered chunks (one micro-batch each)
and read the state-operator metrics off StreamingQueryProgress. With
both sides watermarked and the 1-hour interval condition, Spark must
evict each side's buffered rows once the other side's watermark passes
their join range — so rows ARE removed as the replay advances, and the
peak buffered state stays well below the total rows streamed. If a
refactor ever drops a watermark or breaks the range condition, state
eviction stops and this test fails before a real cluster OOMs.
"""

import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_fraud_detection_spark.streaming import rules as sr

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 4


def _time_ordered_chunks(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ordered_events"))
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    now = time.time()
    bounds = [round(i * n / N_CHUNKS) for i in range(N_CHUNKS + 1)]
    for k in range(N_CHUNKS):
        p = os.path.join(d, f"part{k}.parquet")
        pq.write_table(t.slice(bounds[k], bounds[k + 1] - bounds[k]), p)
        os.utime(p, (now + k, now + k))
    return d, n


def test_bounded_dedup_evicts_state_and_covers_all_keys(
    spark, tmp_path_factory
):
    """dropDuplicatesWithinWatermark must (a) evict dedup state as the
    watermark passes each key's horizon, (b) still emit every distinct
    (user_id, event_type) at least once — the bounded-state contract
    that lets streaming dedup run forever."""
    events_dir, _n = _time_ordered_chunks(tmp_path_factory)
    progress = []
    out = sr.stream_dedup_keys_bounded(
        spark, SF_DIR, delay="30 minutes",
        events_dir=events_dir, progress_out=progress,
    )
    got_keys = {(r.user_id, r.event_type) for r in out.collect()}

    import duckdb

    want = duckdb.sql(
        "SELECT DISTINCT user_id, event_type FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'events.parquet')}')"
    ).fetchall()
    assert got_keys >= set(want)  # superset: re-emission allowed, loss is not

    state = [p["stateOperators"][0] for p in progress if p["stateOperators"]]
    assert sum(s["numRowsRemoved"] for s in state) > 0  # eviction happened
    # bounded: peak keys in state < all distinct keys ever seen would be
    # ideal at real scale; at fixture scale assert it at least never
    # exceeds the distinct-key total (i.e. no duplicate state rows)
    assert max(s["numRowsTotal"] for s in state) <= len(want) + len(got_keys)


def test_interval_join_state_is_watermark_bounded(spark, tmp_path_factory):
    events_dir, n_events = _time_ordered_chunks(tmp_path_factory)
    progress = []
    out = sr.stream_stream_click_purchase_join(
        spark, SF_DIR, events_dir=events_dir, progress_out=progress
    )
    n_out = out.count()
    assert n_out > 0  # the join really matched across batches

    state = [p["stateOperators"][0] for p in progress if p["stateOperators"]]
    assert len(state) >= N_CHUNKS
    total_removed = sum(s["numRowsRemoved"] for s in state)
    peak = max(s["numRowsTotal"] for s in state)
    streamed = sum(s["numRowsUpdated"] for s in state)

    # Eviction is happening: the watermark advance across chunks drops
    # out-of-range buffered rows instead of accreting them.
    assert total_removed > 0
    # The peak buffered state is a fraction of what was streamed into
    # the join — the O(events-per-watermark-window) bound, the property
    # that keeps executor state finite on an unbounded stream.
    assert peak < streamed, (peak, streamed)
    assert peak < 0.75 * streamed, (peak, streamed)
    # End state retains only the final watermark window, not the replay.
    assert state[-1]["numRowsTotal"] < streamed
