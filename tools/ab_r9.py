"""Round-9 same-boot resampling probe for the two round-8 'weak'
bench numbers (q_dedup_embedding_lsh 3.87s, q_tpch_q20 3.13s — both
recorded with spread ≈ median on a demonstrably noisy boot, and both
on code untouched since round 7, so there is no tree to A/B: the
question is purely whether the recorded numbers reproduce under a
falsifiable protocol).

Protocol = the q_stream_join playbook (SCALE.md round 8): ONE warmed
session, N interleaved samples per query (alternating so a host stall
hits both queries equally), bench-identical per-sample hygiene
(clearCache + registry drain before each sample). Reports median,
spread, and all samples.

Usage: python tools/ab_r9.py [n_samples] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_fraud_detection_spark.operators.dedup import release_shingles
from etl_fraud_detection_spark.operators.sampling import release_ranked
from etl_fraud_detection_spark.plans.queries import QUERIES
from etl_fraud_detection_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sample(spark, name: str) -> float:
    release_shingles()
    release_ranked()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, SF_DIR).count()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or ["q_dedup_embedding_lsh", "q_tpch_q20"]
    spark = get_spark("ab_r9")
    spark.sparkContext.setLogLevel("ERROR")
    for q in names:  # warm JVM/footers/codegen per query, uncounted
        sample(spark, q)
    got: dict[str, list[float]] = {q: [] for q in names}
    for i in range(n):
        for q in names:  # interleaved, alternating
            got[q].append(sample(spark, q))
            print(f"# round {i + 1}: {q} {got[q][-1]:.3f}s", file=sys.stderr)
    for q in names:
        s = got[q]
        print(
            f"{q}: median={statistics.median(s):.3f}s "
            f"spread={max(s) - min(s):.3f}s "
            f"samples={','.join(f'{x:.2f}' for x in s)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
