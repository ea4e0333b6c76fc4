"""Bisect the round-3 TPC-H bench regression.

Hypotheses from VERDICT r3: the family-wide ~2-20x slowdown vs round-2
medians is (a) session/JVM state left by earlier catalog families
(streaming memory sinks, GC pressure), (b) the System.gc() calls in the
bench loop, or (c) round-2 numbers being cache-flattered.

Modes (run each in a FRESH process):
  alone      - TPC-H family only, nothing before it
  after_all  - full catalog in registration order first, then TPC-H timed
  after_stream - the 10 q_stream_* first, then TPC-H timed
  no_gc      - like after_stream but without the System.gc() drain

Each mode times the 22 TPC-H queries 3x and prints per-query medians +
family total, bench-style (clearCache before each query).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_fraud_detection_spark.plans.queries import QUERIES, family  # noqa: E402
from etl_fraud_detection_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_STREAM_VIEWS = (
    "stream_win_agg", "stream_sliding_agg", "stream_rule3", "stream_rule4",
    "stream_dedup", "stream_sessions", "stream_asof", "stream_join",
    "stream_join_outer", "stream_fraud1",
)


def run_one(spark, name, gc=True):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    dropped = False
    for view in _STREAM_VIEWS:
        try:
            dropped = spark.catalog.dropTempView(view) or dropped
        except Exception:
            pass
    if dropped and gc:
        spark.sparkContext._jvm.System.gc()
    return dt


def main():
    mode = sys.argv[1]
    spark = get_spark("bisect")
    spark.sparkContext.setLogLevel("ERROR")
    tpch = [n for n in QUERIES if family(n) == "tpch"]
    # same warm-up bench does
    next(iter(QUERIES.values())).fn(spark, SF_DIR).count()

    gc = mode != "no_gc"
    if mode == "after_all":
        for n in QUERIES:
            if family(n) != "tpch":
                run_one(spark, n, gc)
    elif mode in ("after_stream", "no_gc"):
        for n in QUERIES:
            if family(n) == "stream":
                run_one(spark, n, gc)

    runs = []
    for _ in range(3):
        runs.append({n: run_one(spark, n, gc) for n in tpch})
    med = {n: round(statistics.median(r[n] for r in runs), 4) for n in tpch}
    print(json.dumps({"mode": mode, "total": round(sum(med.values()), 3),
                      "queries": med}))
    spark.stop()


if __name__ == "__main__":
    main()
