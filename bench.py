"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line on stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "runs": N, "n_queries": Q, "sf": ...}. Per-query medians
and spread go to BENCH_DETAIL.json next to this file — the driver
captures only the tail of stdout, and a full per-query inline dict overflows
it (round-2 BENCH parsed as null for exactly that reason).

Each query is timed as plan-build + full execution (count via a
write-nothing action) — results are not collected to the driver, matching
how a real pipeline consumes them. The whole catalog is measured
$SPARK_GRAFT_BENCH_RUNS times (default 3) and per-query MEDIANS are
reported: this host's wall-clock noise is ~2x run to run, so a single
sample cannot attribute a regression; the spread field records max-min
so a noisy sample is visible instead of silently folded in.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_fraud_detection_spark.plans.queries import QUERIES  # noqa: E402
from etl_fraud_detection_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

_STREAM_VIEWS = (
    "stream_win_agg", "stream_sliding_agg", "stream_rule3", "stream_rule4",
    "stream_dedup", "stream_sessions", "stream_asof", "stream_join",
    "stream_join_outer", "stream_fraud1",
)


def _run_catalog(spark) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        # Each query is timed from a clean cache so earlier queries'
        # persisted frames don't skew later measurements.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count()
        timings[name] = time.perf_counter() - t0
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # Free memory-sink tables of drained streaming queries — a
        # "complete"-mode sink pins its rows on the driver and skews the
        # next query's timing.
        dropped = False
        for view in _STREAM_VIEWS:
            try:
                dropped = spark.catalog.dropTempView(view) or dropped
            except Exception:
                pass
        if dropped:
            # reclaim the sink rows now, not during the next measurement
            spark.sparkContext._jvm.System.gc()
    return timings


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch JIT.
    next(iter(QUERIES.values())).fn(spark, SF_DIR).count()

    runs = []
    for i in range(N_RUNS):
        print(f"# --- run {i + 1}/{N_RUNS} ---", file=sys.stderr)
        runs.append(_run_catalog(spark))

    medians = {
        name: round(statistics.median(r[name] for r in runs), 4)
        for name in QUERIES
    }
    spread = {
        name: round(
            max(r[name] for r in runs) - min(r[name] for r in runs), 4
        )
        for name in QUERIES
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "queries": medians,
                "spread": spread,
                "runs": N_RUNS,
                "sf": sf_val,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(medians.values()), 4),
                "unit": "sec",
                "runs": N_RUNS,
                "n_queries": len(medians),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
