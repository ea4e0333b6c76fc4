"""Structured Streaming variants of the fraud-rule shapes (SURVEY §2.10:
an extension — the reference is pure daily batch, but its watermark +
file-date pattern is exactly a file-stream with bookmark).

Two shapes:
- windowed_event_counts: tumbling-window aggregate with an event-time
  watermark — the streaming analog of the report's per-day grain.
- rule3_city_hop_stream / rule4_amount_guess_stream / asof_enrich_stream:
  custom stateful operators via applyInPandasWithState running over a
  watermark-ordered replay harness (see _ordered_replay_fn): per-key
  buffers release events to the lag logic only once the event-time
  watermark passes them, so unordered multi-batch arrival within the
  watermark delay is handled, not assumed away.

Both run with Trigger.AvailableNow against the parquet events table so
they are testable offline and comparable to their batch twins.

Scale notes: state is keyed by user_id — Spark hash-partitions state
across executors; the watermark bounds state size (late events beyond
1h are dropped, state for quiet users ages out with timeouts in a
production variant).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from datetime import timedelta

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EVENTS_COLS = "event_id bigint, {ts}, user_id bigint, event_type string, value double, props string"


def _events_spec(src: str) -> tuple[str, str]:
    """(readStream schema, ts-normalizing SQL expr) matched to the
    physical type of ``events.ts`` in the parquet at ``src`` (file or
    directory) — the streaming twin of catalog.load_table's
    type-conditional nanos normalization. The session timezone is
    pinned to UTC (session.tune), so NTZ→LTZ is lossless and the
    downstream watermark/window code always sees TimestampType."""
    from ..catalog import events_ts_physical

    if events_ts_physical(src) == "timestamp":
        return (
            _EVENTS_COLS.format(ts="ts timestamp_ntz"),
            "cast(ts as timestamp)",
        )
    # TIMESTAMP(NANOS) file: read as bigint nanos (nanosAsLong), truncate
    # to micros exactly like DuckDB.
    return (
        _EVENTS_COLS.format(ts="ts bigint"),
        "cast(timestamp_micros(ts div 1000) as timestamp)",
    )


def _scratch_tag(sf_dir: str) -> str:
    """Scratch-dir key covering (path, mtime, size) of the source
    events.parquet, so regenerated testdata can never pair with a stale
    symlink/heartbeat cached from a previous file."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    return hashlib.md5(key.encode()).hexdigest()[:12]


def _link_events(src: str, d: str) -> None:
    """Symlink the events source into scratch dir ``d`` — one link for
    a single-file source, one link per part file when the source is a
    directory (the file stream source lists files, it does NOT recurse
    through a dir-valued symlink)."""
    os.makedirs(d, exist_ok=True)
    if os.path.isdir(src):
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                link = os.path.join(d, f"events_{f}")
                if not os.path.islink(link):
                    os.symlink(os.path.join(src, f), link)
    else:
        link = os.path.join(d, "events.parquet")
        if not os.path.islink(link):
            os.symlink(src, link)


def _stream_dir(sf_dir: str) -> str:
    """Spark's file stream source requires a *directory*; the testdata
    ships ``events.parquet`` as a single file (a dir of part files for
    the scaled probe). Build (once per source version) a scratch dir of
    symlinks to it."""
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), f"spark_events_stream_{_scratch_tag(sf_dir)}"
    )
    _link_events(os.path.join(sf_dir, "events.parquet"), d)
    return d


class _few_state_partitions:
    """Run a stream with few state partitions: local state store instances
    cost ~RocksDB/HDFS-backed overhead per partition per micro-batch; at
    test scale 4 partitions beat 8 beat 32 (measured on the drained
    replay harness). (On a real cluster you would size this to executor
    count instead.)"""

    def __init__(self, spark: SparkSession, n: int = 4):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import tune

    tune(spark)
    d = _stream_dir(sf_dir)
    schema, norm = _events_spec(d)
    raw = spark.readStream.schema(schema).parquet(d)
    return raw.withColumn("ts", F.expr(norm))


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour per-user aggregate with a 1-hour watermark,
    drained via AvailableNow into a memory sink; returns the final
    batch-equivalent result. Aggregates chosen exact (count/min/max) so
    the DuckDB oracle matches bitwise."""
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
        .select(
            "user_id",
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "n_events",
            "max_value",
            "min_value",
        )
    )
    name = "stream_win_agg"
    # state here is (user × hour) ≈ corpus-cardinality — an order more
    # rows than the other drained streams' state — so it pays for more
    # store instances: 8 partitions beat 4 by ~12% and 32 by ~30%
    # (same-boot sweep, SCALE.md round 6). Small-state streams keep 4.
    with _few_state_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING 1-hour / 15-minute-slide aggregate per event type: every
    event lands in exactly 4 overlapping windows (window starts are
    epoch-aligned multiples of the slide — Spark's F.window contract,
    mirrored arithmetically in the oracle). State is one row per open
    (window, type) pair — bounded by the watermark horizon × overlap
    factor, independent of event volume. Aggregates chosen exact
    (count/min/max) so the DuckDB oracle matches bitwise."""
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
        .select(
            "event_type",
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "n_events",
            "max_value",
            "min_value",
        )
    )
    name = "stream_sliding_agg"
    with _few_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Watermark-ordered replay: the harness that makes the custom stateful
# operators (rules 3/4, as-of) correct on UNORDERED input.
#
# The lag-style logic of these operators is only sound over per-key
# event-time order. Sorting inside one micro-batch is not enough when
# events for a key straddle batches out of order, so each key buffers
# incoming events in state and the step function consumes an event only
# once the event-time watermark has passed it (ts < watermark — ties at
# the watermark could still gain siblings, so they wait). Keys with a
# non-empty buffer register an event-time timeout; when a later batch
# advances the watermark (the far-future heartbeat file guarantees this
# at end-of-replay), the timed-out key flushes. Disorder beyond the
# watermark delay is dropped by Spark's late-row filter — the standard
# streaming contract, stated instead of silently assumed.
#
# State per key = O(events inside the watermark window) + O(1) carry —
# bounded, hash-partitioned across executors, exactly the shape that
# scales to a 1000-executor cluster.
# ---------------------------------------------------------------------------

_BUF_SCHEMA = (
    "buf_ts array<timestamp>, buf_id array<bigint>, "
    "buf_type array<string>, buf_val array<double>"
)


def _ordered_replay_fn(step, carry_defaults, out_cols, purchase_last=False,
                       complete=False):
    """Build an applyInPandasWithState function that feeds ``step``
    (user_id, carry, row) -> (carry, hit|None) the key's events in
    event-time order, releasing only watermark-passed events.

    ``complete=True`` is the bounded-replay fast path: the caller built
    the source dir itself (ONE complete events file + the heartbeat),
    so the first micro-batch provably holds every event of the key —
    sort and run the step logic immediately instead of round-tripping
    the whole table through the state store. Arbitrary multi-file dirs
    (live streams, the shuffled-replay tests) keep the strict
    watermark-ordered release."""

    def _sorted(bdf: pd.DataFrame) -> pd.DataFrame:
        if purchase_last:  # ties: clicks apply before purchases (>= asof)
            return bdf.assign(_p=bdf["event_type"].eq("purchase")).sort_values(
                ["ts", "_p", "event_id"]
            )
        return bdf.sort_values(["ts", "event_id"])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if complete:
            carry = list(carry_defaults)
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if not chunks:
                return
            bdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            hits = []
            for r in _sorted(bdf).itertuples(index=False):
                carry, hit = step(user_id, carry, r)
                if hit is not None:
                    hits.append(hit)
            if hits:
                yield pd.DataFrame(hits, columns=out_cols)
            return
        if state.exists:
            st = state.get
            buf = [list(x) for x in st[:4]]
            carry = list(st[4:])
        else:
            buf = [[], [], [], []]
            carry = list(carry_defaults)
        for pdf in pdfs:
            if len(pdf):
                buf[0] += pdf["ts"].tolist()
                buf[1] += pdf["event_id"].tolist()
                buf[2] += pdf["event_type"].tolist()
                buf[3] += pdf["value"].tolist()
        # Same release rule on data batches and timeout wakeups: only
        # events the watermark has passed (ts < wm; ties at the wm could
        # still gain siblings). Keys left with a buffer re-arm the
        # timeout below, so every watermark advance flushes eventually.
        wm_ms = state.getCurrentWatermarkMs()
        wm = pd.Timestamp(wm_ms, unit="ms") if wm_ms > 0 else None
        if wm is None or not buf[0] or min(buf[0]) >= wm:
            # Nothing releasable (the common case for the buffering
            # batch, where the watermark still trails every event):
            # store the raw buffers — no DataFrame build, no sort.
            state.update((*buf, *carry))
            if buf[0]:
                state.setTimeoutTimestamp(wm_ms + 1)
            return
        bdf = pd.DataFrame(
            {"ts": buf[0], "event_id": buf[1], "event_type": buf[2], "value": buf[3]}
        )
        mask = bdf["ts"] < wm
        rel, pend = bdf[mask], bdf[~mask]
        # Only the released slice needs event-time order — the pending
        # rows all sit at/after the watermark and will be sorted when
        # their own release comes.
        rel = _sorted(rel)
        hits = []
        for r in rel.itertuples(index=False):
            carry, hit = step(user_id, carry, r)
            if hit is not None:
                hits.append(hit)
        state.update((
            pend["ts"].tolist(), pend["event_id"].tolist(),
            pend["event_type"].tolist(), pend["value"].tolist(), *carry,
        ))
        if len(pend):
            # flush when the watermark moves past the buffered events
            state.setTimeoutTimestamp(wm_ms + 1)
        if hits:
            yield pd.DataFrame(hits, columns=out_cols)

    return fn


def _run_ordered_replay(
    spark: SparkSession,
    sf_dir: str,
    step,
    carry_defaults,
    carry_schema: str,
    out_schema: str,
    out_cols: list[str],
    name: str,
    delay: str = "0 seconds",
    events_dir: str | None = None,
    purchase_last: bool = False,
) -> DataFrame:
    """Stream events (multi-file, one file per micro-batch, heartbeat
    last) through an ordered-replay state function. ``delay`` is the
    tolerated disorder across the replay; ``events_dir`` overrides the
    source directory (tests replay shuffled copies)."""
    from ..session import tune

    tune(spark)
    d = events_dir or _stream_dir_with_heartbeat(sf_dir)
    schema, norm = _events_spec(d)
    reader = spark.readStream.schema(schema)
    if events_dir is not None:
        # Tests replay shuffled copies one file per micro-batch to
        # exercise cross-batch disorder. The default bounded replay
        # (events + heartbeat) instead ingests in ONE batch: every
        # event buffers (watermark still 0), then the single timeout
        # batch releases everything — one state round trip instead of
        # one per file.
        reader = reader.option("maxFilesPerTrigger", 1)
    raw = reader.parquet(d)
    events = raw.withColumn("ts", F.expr(norm)).withWatermark("ts", delay)
    fn = _ordered_replay_fn(
        step, carry_defaults, out_cols, purchase_last,
        complete=events_dir is None,
    )
    flagged = events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, _BUF_SCHEMA + ", " + carry_schema,
        "append", GroupStateTimeout.EventTimeTimeout,
    )
    # heartbeat key filtered AFTER the drain — inside the plan the filter
    # would push below EventTimeWatermark and the heartbeat would never
    # advance it
    # applyInPandasWithState ships every user group through an Arrow
    # round trip per batch; with per-user (corpus-cardinality) state the
    # work parallelizes across state partitions, so unlike the
    # small-state joins (4) this path wants more: same-boot sweep
    # measured asof 3.8s@4 -> 2.9s@8 -> 2.3s@16 -> 2.7s@32.
    return _drain_append(
        spark, flagged, name, state_partitions=16
    ).where(F.col("user_id") >= 0)


def rule3_city_hop_stream(
    spark: SparkSession, sf_dir: str,
    delay: str = "0 seconds", events_dir: str | None = None,
) -> DataFrame:
    """Rule-3 as a custom stateful streaming operator: per-user carry =
    (last_ts, last_type); emit events whose type differs from the
    previous one within < 1 hour (trsh_rep_fraud_sync.sql:76-77
    semantics on the events analog). Runs over the watermark-ordered
    replay harness, so shuffled multi-batch arrival gives the same
    answer as the batch window query (tests/test_streaming.py)."""

    def step(user_id, carry, r):
        last_ts, last_type = carry
        hit = None
        if (
            last_type is not None
            and r.event_type != last_type
            and r.ts < last_ts + timedelta(hours=1)
        ):
            hit = (r.event_id, user_id, r.ts, r.event_type, last_type, last_ts)
        return [r.ts, r.event_type], hit

    out = _run_ordered_replay(
        spark, sf_dir, step,
        carry_defaults=(None, None),
        carry_schema="last_ts timestamp, last_type string",
        out_schema=(
            "event_id bigint, user_id bigint, ts timestamp, event_type string, "
            "prv_type string, prv_ts timestamp"
        ),
        out_cols=["event_id", "user_id", "ts", "event_type", "prv_type", "prv_ts"],
        name="stream_rule3", delay=delay, events_dir=events_dir,
    )
    return out.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_type", "prv_type",
        F.col("prv_ts").cast("timestamp_ntz").alias("prv_ts"),
    )


def _drain_append(
    spark: SparkSession, flagged: DataFrame, name: str,
    progress_out: list | None = None,
    state_partitions: int = 4,
    no_data_batches: bool = True,
) -> DataFrame:
    """AvailableNow drain into a memory sink. ``no_data_batches=False``
    skips the trailing no-data micro-batch: every state-store instance
    commits a delta there (16 instances for a stream-stream join at 4
    partitions — measured ~0.7s of pure commit time on the replay
    harness), which is pure overhead for queries whose OUTPUT is
    already complete at end-of-data (inner joins: matches emit in the
    data batch; the no-data batch only evicts state, and the drained
    query is stopped right after anyway). Queries that FLUSH results on
    watermark advance (windowed aggs, outer joins, dedup-within-wm,
    sessionization) must keep it True or their tails never emit."""
    no_data_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    saved = spark.conf.get(no_data_key)
    with _few_state_partitions(spark, state_partitions):
        spark.conf.set(no_data_key, str(no_data_batches).lower())
        try:
            q = (
                flagged.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set(no_data_key, saved)
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    return spark.table(name)


def _stream_dir_with_heartbeat(sf_dir: str) -> str:
    """Like _stream_dir, plus a one-row far-future 'heartbeat' file
    (user_id = -1, ts = 2100-01-01). Whether it rides in the same
    micro-batch as the data (the default single-batch replay) or in its
    own (one-file-per-trigger tests), it advances the event-time
    watermark past every real event at end-of-batch, so the final
    no-data batch emits the sessions/outer rows still open at
    end-of-data — the standard heartbeat idiom for flushing final
    windows from a bounded replay. The heartbeat's
    ``ts`` is written in the SOURCE file's physical type (matching
    schema is a file-stream requirement; the source type varies across
    driver testdata versions — see catalog.events_ts_physical)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    d = os.path.join(
        tempfile.gettempdir(), f"spark_events_stream_hb_{_scratch_tag(sf_dir)}"
    )
    _link_events(src, d)
    hb = os.path.join(d, "heartbeat.parquet")
    if not os.path.exists(hb):
        t_2100_s = 4102444800
        schema_src = src
        if os.path.isdir(schema_src):  # scaled-probe events are a dir
            schema_src = os.path.join(
                schema_src,
                sorted(
                    f for f in os.listdir(schema_src) if f.endswith(".parquet")
                )[0],
            )
        src_schema = pq.read_schema(schema_src)
        hb_table = pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array([t_2100_s * 10**9], pa.int64()).cast(
                    pa.timestamp("ns")
                ),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["heartbeat"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([""], pa.string()),
            }
        ).cast(src_schema)
        pq.write_table(hb_table, hb)
    return d


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user via
    F.session_window — the built-in stateful session operator (merges
    overlapping sessions; state is per-key session ranges, bounded by
    the watermark). Drained with AvailableNow; the heartbeat batch
    closes the sessions still open at end-of-data."""
    from ..session import tune

    tune(spark)
    d = _stream_dir_with_heartbeat(sf_dir)
    schema, norm = _events_spec(d)
    # events + heartbeat in ONE micro-batch: the heartbeat still
    # advances the watermark at end-of-batch, so the final (no-data)
    # batch emits every closed session — same answer, one fewer state
    # store round trip than a one-file-per-trigger replay.
    raw = spark.readStream.schema(schema).parquet(d)
    events = raw.withColumn("ts", F.expr(norm))
    agg = (
        events.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").cast("timestamp_ntz").alias("session_start"),
            F.col("win.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    # Drop the heartbeat's own (still-open, never-emitted) key AFTER the
    # drain: a filter inside the streaming plan would be pushed below the
    # watermark node and the heartbeat row would never advance it.
    return _drain_append(spark, agg, "stream_sessions").where(F.col("user_id") >= 0)


def asof_enrich_stream(
    spark: SparkSession, sf_dir: str,
    delay: str = "0 seconds", events_dir: str | None = None,
) -> DataFrame:
    """Streaming as-of join: each purchase is enriched with the latest
    preceding (inclusive) click of the same user — per-key carry is just
    the last click (ts, event_id, value), the O(1)-carry streaming twin
    of operators/temporal.asof_join, running over the watermark-ordered
    replay harness. Clicks at the same event time apply in event_id
    order (matching the batch oracle's dedupe-by-max-event_id) and
    BEFORE purchases at equal ts (inclusive ``>=`` semantics); other
    event types pass through the buffer as no-ops."""

    def step(user_id, carry, r):
        last_ts, last_id, last_val = carry
        hit = None
        if r.event_type == "click":
            carry = [r.ts, r.event_id, r.value]
        elif r.event_type == "purchase" and last_ts is not None:
            hit = (r.event_id, user_id, r.ts, last_ts, last_id, last_val)
        return carry, hit

    out = _run_ordered_replay(
        spark, sf_dir, step,
        carry_defaults=(None, None, None),
        carry_schema="last_ts timestamp, last_id bigint, last_val double",
        out_schema=(
            "event_id bigint, user_id bigint, ts timestamp, "
            "asof_ts timestamp, asof_event_id bigint, asof_value double"
        ),
        out_cols=["event_id", "user_id", "ts", "asof_ts", "asof_event_id", "asof_value"],
        name="stream_asof", delay=delay, events_dir=events_dir,
        purchase_last=True,
    )
    return out.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("asof_ts").cast("timestamp_ntz").alias("asof_ts"),
        "asof_event_id", "asof_value",
    )


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first-seen (user_id, event_type) pairs via
    dropDuplicates over the event stream — the streaming twin of the
    batch hash-groupBy dedup. Output is the key set only (which copy
    survives is arrival-order dependent; the set is deterministic).

    At scale the dedup state is hash-partitioned by key across
    executors; a production variant bounds it with
    dropDuplicatesWithinWatermark so keys age out after the lateness
    horizon instead of growing forever."""
    events = _read_events_stream(spark, sf_dir)
    deduped = events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _drain_append(spark, deduped, "stream_dedup")


def stream_dedup_keys_bounded(
    spark: SparkSession, sf_dir: str, delay: str = "30 minutes",
    events_dir: str | None = None, progress_out: list | None = None,
) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    guarantees exact dedup for duplicates arriving within ``delay`` of
    each other and lets the state store EVICT keys once the watermark
    passes their horizon — the production form of stream_dedup_keys,
    whose dropDuplicates state otherwise grows with every key ever
    seen. A key recurring after eviction re-emits (the documented
    within-watermark contract), so output is a superset of the global
    key set; tests/test_stream_state.py asserts the eviction actually
    happens and bounds peak state."""
    if events_dir is not None:
        from ..session import tune

        tune(spark)
        schema, norm = _events_spec(events_dir)
        events = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
            .withColumn("ts", F.expr(norm))
        )
    else:
        events = _read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", delay)
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _drain_append(
        spark, deduped, "stream_dedup_wm", progress_out=progress_out
    )


def rule1_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud rule 1 on a LIVE transaction stream: the same batch rule
    code (plans.fraud.temporal_base + rule1_bad_passport) applied to a
    streaming transactions source — every dimension join is a
    stream-STATIC broadcast join, so the rule logic is input-mode
    agnostic: one definition, two execution modes. The report watermark
    is applied at the source (the bookmark decides which files enter
    the stream — exactly the reference's file-date gating).

    Scale shape: the stream side never shuffles (all dims broadcast);
    state is zero (no aggregation) — each micro-batch flags and emits
    independently."""
    import tempfile

    from ..plans import fraud
    from ..plans import fraud_domain as FD
    from ..session import tune

    tune(spark)
    t = FD.fraud_tables(spark)
    empty_report = spark.createDataFrame([], schema="report_dt date")
    tx = fraud.report_watermark_filter(t["ff_transactions"], empty_report)

    d = tempfile.mkdtemp(prefix="stream_fraud_tx_")
    # repartition(1), NOT coalesce(1): the fixture df is driver-local
    # data in defaultParallelism slices, and a single coalesced task
    # pays per-slice Python-worker setup serially (~5s for 32 slices);
    # the shuffle to 1 partition is milliseconds here.
    tx.repartition(1).write.mode("overwrite").parquet(d)
    tx_stream = spark.readStream.schema(t["ff_transactions"].schema).parquet(d)

    base = fraud.temporal_base(
        tx_stream, t["ff_cards_hist"], t["ff_accounts_hist"], t["ff_clients_hist"]
    )
    out = fraud.rule1_bad_passport(
        base, t["ff_blacklist"], F.expr("TIMESTAMP_NTZ '2025-01-15 12:00:00'")
    )
    return _drain_append(spark, out, "stream_fraud1")


def stream_stream_click_purchase_join(
    spark: SparkSession, sf_dir: str,
    events_dir: str | None = None, progress_out: list | None = None,
) -> DataFrame:
    """Stream-stream interval join: every purchase joined to the same
    user's clicks in the preceding hour (inclusive), both sides
    watermarked — Spark's built-in symmetric-hash stream-stream join.

    The event-time range condition (click_ts in [purchase_ts - 1h,
    purchase_ts]) plus the two watermarks is what lets Spark BOUND the
    join state: each side's buffered rows are dropped once the other
    side's watermark passes the range, so state is O(events per hour),
    not O(stream history) — hash-partitioned by user_id across
    executors. Inner-join matches emit immediately per micro-batch, so
    a bounded replay needs no heartbeat flush.

    ``events_dir`` overrides the source with a multi-file dir replayed
    one file per micro-batch, and ``progress_out`` collects the
    per-batch StreamingQueryProgress — tests/test_stream_state.py uses
    both to assert the state REALLY is watermark-bounded (rows evicted
    as the watermark advances, peak state << stream length)."""
    if events_dir is not None:
        from ..session import tune

        tune(spark)
        schema, norm = _events_spec(events_dir)
        events = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
            .withColumn("ts", F.expr(norm))
        )
    else:
        events = _read_events_stream(spark, sf_dir)
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    )
    # inner-join matches emit in the data batch itself; the trailing
    # no-data batch would only evict state the query is about to drop —
    # skip it (one fewer full state-commit round per drain)
    out = _drain_append(
        spark, joined, "stream_join", progress_out=progress_out,
        no_data_batches=False,
    )
    return out.select(
        "purchase_id", "user_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "click_value",
    )


def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase with the
    same user's clicks in the preceding hour, or NULL click columns if
    none arrived. The hard part vs the inner join is the null side:
    Spark can only emit an unmatched left row once the RIGHT watermark
    has passed the row's join range (proving no match can still
    arrive), so a bounded replay must advance the watermark PAST the
    last real event or the tail purchases' outer rows never flush.

    The heartbeat idiom does that: the far-future heartbeat row rides
    through BOTH side filters (its own event_type is kept exactly so
    the filter cannot be pushed below the EventTimeWatermark node and
    strand the watermark), advances both watermarks in its own
    micro-batch, and the AvailableNow final batch emits the remaining
    outer rows. The heartbeat's user_id (-1) matches nothing, so its
    own outer row is dropped from the DRAINED result — never inside
    the streaming plan.

    State stays bounded exactly as in the inner join: buffered rows
    drop once the other side's watermark passes the interval."""
    d = _stream_dir_with_heartbeat(sf_dir)
    schema, norm = _events_spec(d)
    # single batch: inner matches emit from the data batch, the
    # heartbeat advances both watermarks at end-of-batch, and the final
    # no-data batch flushes the unmatched-left rows — same answer as
    # the one-file-per-trigger replay, one fewer join-state round trip
    raw = spark.readStream.schema(schema).parquet(d)
    events = raw.withColumn("ts", F.expr(norm))
    clicks = (
        events.where(F.col("event_type").isin("click", "heartbeat"))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.where(F.col("event_type").isin("purchase", "heartbeat"))
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "leftOuter",
    )
    out = _drain_append(spark, joined, "stream_join_outer")
    # Heartbeat rows (both the left heartbeat's own outer row and any
    # click-side heartbeat remnant) are dropped from the DRAINED batch.
    return (
        out.where(F.col("user_id") >= 0)
        .select(
            "purchase_id", "user_id",
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            "click_id",
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            "click_value",
        )
    )


def rule4_amount_guess_stream(
    spark: SparkSession, sf_dir: str,
    delay: str = "0 seconds", events_dir: str | None = None,
) -> DataFrame:
    """Rule-4 (amount guessing, trsh_rep_fraud_sync.sql:82-129 analog) as
    a stateful streaming operator over the watermark-ordered replay
    harness. Per-user carry = the last 3 events (ts, value, is_error)
    plus the previous row's decrease flag — enough to reproduce every
    ROWS-frame in the batch query:

      prv_value           LAG(value)                 <- deque[-1]
      min_ts / oper       MIN(ts)/SUM(err) -3..-1    <- whole deque
      reducion            MIN(flag) -1..current      <- prv_flag & flag

    Emits events where event_type='purchase', >=2 errors in the prior 3,
    ts < min_ts + 12h, and the last two steps both decreased — identical
    to the batch window query (the oracle)."""

    def step(user_id, carry, r):
        tss, vals, errs, prv_flag = carry
        tss, vals, errs = list(tss), list(vals), list(errs)
        flag = 1 if tss and r.value < vals[-1] else 0
        reducion = min(prv_flag, flag) if tss else flag
        hit = None
        if (
            r.event_type == "purchase"
            and tss
            and sum(errs) >= 2
            and r.ts < min(tss) + timedelta(hours=12)
            and reducion == 1
        ):
            hit = (r.event_id, user_id, r.ts, r.value, min(tss))
        tss.append(r.ts)
        vals.append(r.value)
        errs.append(1 if r.event_type == "error" else 0)
        return [tss[-3:], vals[-3:], errs[-3:], flag], hit

    out = _run_ordered_replay(
        spark, sf_dir, step,
        carry_defaults=((), (), (), 0),
        carry_schema=(
            "tss array<timestamp>, vals array<double>, errs array<int>, prv_flag int"
        ),
        out_schema=(
            "event_id bigint, user_id bigint, ts timestamp, value double, "
            "min_ts timestamp"
        ),
        out_cols=["event_id", "user_id", "ts", "value", "min_ts"],
        name="stream_rule4", delay=delay, events_dir=events_dir,
    )
    return out.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
        F.col("min_ts").cast("timestamp_ntz").alias("min_ts"),
    )
