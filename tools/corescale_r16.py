"""Core-scaling receipt (r15 verdict task 5): the sf0.1 bench cannot
evidence core scaling (8c total ≈ 32c total — the catalog is
fixed-latency-bound at fixture scale), so this probe UPSCALES the input
(scale_probe.build_scaled's deterministic cloning) and times one
representative query per heavy family at 8 vs 32 cores in SEPARATE
processes (local[n] is a session-static master), reporting the
8c/32c wall ratio. Plans that claim parallelism should show ratios
approaching the core ratio as data grows; a ratio ≈1 at Nx data means
the query is still latency-bound, not compute-bound, and names a fix
or a rationale for SCALE.md.

Usage:
  python tools/corescale_r16.py [--factor 8] [--runs 3] [query ...]
  (spawns itself with SPARK_GRAFT_CPUS=8/32 in worker mode)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one representative per heavy family (dedup / ann / dsir / corpus)
DEFAULT_PROBES = [
    "q_dedup_minhash_lsh",
    "q_ann_opq_ivf",
    "q_dsir_select",
    "q_corpus_admit",
]

_STREAM_VIEWS = (
    "stream_win_agg", "stream_sessions", "stream_join", "stream_rule3",
)


def worker(scaled_dir: str, names: list[str], runs: int) -> None:
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.operators.sampling import release_ranked
    from etl_fraud_detection_spark.plans.queries import QUERIES
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("corescale_r16")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        samples = []
        for i in range(runs + 1):  # first sample = warm (fixtures, JIT)
            release_shingles()
            release_ranked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, scaled_dir).count()
            took = time.perf_counter() - t0
            for view in _STREAM_VIEWS:
                try:
                    spark.catalog.dropTempView(view)
                except Exception:
                    pass
            if i > 0:
                samples.append(took)
            print(f"#   {name}[{i}]: {took:.3f}s", file=sys.stderr)
        out[name] = statistics.median(samples)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--scaled-dir", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT_PROBES

    if args.worker:
        worker(args.scaled_dir, names, args.runs)
        return

    scaled_dir = os.path.join("/tmp", f"spark_graft_scale_{args.factor}x")
    if not os.path.isdir(os.path.join(scaled_dir, "events.parquet")):
        from etl_fraud_detection_spark.session import get_spark
        from tools.scale_probe import build_scaled

        spark = get_spark("corescale_build")
        spark.sparkContext.setLogLevel("ERROR")
        build_scaled(spark, args.sf, scaled_dir, args.factor)
        spark.stop()

    results: dict[str, dict[str, float]] = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--scaled-dir", scaled_dir, "--runs", str(args.runs), *names,
        ]
        print(f"# spawning worker at {cpus} cores ...", file=sys.stderr)
        r = subprocess.run(
            cmd, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(r.stderr[-4000:])
        if r.returncode != 0:
            print(f"worker at {cpus} cores failed rc={r.returncode}")
            sys.exit(1)
        results[cpus] = json.loads(r.stdout.strip().splitlines()[-1])

    print(f"\n# core-scaling at {args.factor}x data, median of {args.runs}")
    print("| query | t_8c (s) | t_32c (s) | 8c/32c ratio |")
    print("|---|---|---|---|")
    for name in names:
        t8, t32 = results["8"][name], results["32"][name]
        print(f"| {name} | {t8:.2f} | {t32:.2f} | {t8 / t32:.2f}x |")


if __name__ == "__main__":
    main()
