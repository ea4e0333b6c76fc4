"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + full execution (count via a
write-nothing action) — results are not collected to the driver, matching
how a real pipeline consumes them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_fraud_detection_spark.plans.queries import QUERIES  # noqa: E402
from etl_fraud_detection_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch JIT.
    next(iter(QUERIES.values())).fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        # Each query is timed from a clean cache so earlier queries'
        # persisted frames don't skew later measurements.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # Free memory-sink tables of drained streaming queries — a
        # "complete"-mode sink pins its rows on the driver and skews the
        # next query's timing.
        dropped = False
        for view in (
            "stream_win_agg", "stream_rule3", "stream_rule4",
            "stream_dedup", "stream_sessions", "stream_asof",
        ):
            try:
                dropped = spark.catalog.dropTempView(view) or dropped
            except Exception:
                pass
        if dropped:
            # reclaim the sink rows now, not during the next measurement
            spark.sparkContext._jvm.System.gc()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
