"""Round-16 A/B timing probe: run named catalog queries with the
bench's exact methodology (clean cache + release registries, then
plan-build + count()) N times interleaved and print per-query medians.
Fast feedback between bench sweeps; the committed record stays the
full bench.py run.

Usage: python tools/ab_r16.py query [query ...] [--sf DIR] [-n RUNS]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_fraud_detection_spark.plans.queries import QUERIES  # noqa: E402
from etl_fraud_detection_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=5)
    args = ap.parse_args()
    spark = get_spark("ab_r16")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.operators.sampling import release_ranked

    def one(name: str) -> float:
        release_shingles()
        release_ranked()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, args.sf)
        n = df.count()
        took = time.perf_counter() - t0
        print(f"#   {name}: {took:.3f}s ({n} rows)", file=sys.stderr)
        return took

    # warm: JIT + parquet footers + any build-once warehouse fixtures
    for name in args.names:
        one(name)
    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.n):
        for name in args.names:
            samples[name].append(one(name))
    for name in args.names:
        s = samples[name]
        print(
            f"{name}: median={statistics.median(s):.3f}s "
            f"min={min(s):.3f} max={max(s):.3f} n={len(s)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
