"""Measured scaling evidence: run selected heavyweight queries at 1x
and Nx data volume and report the wall-clock ratio per query.

The Nx corpus is built by unioning N deterministically-perturbed copies
of the real testdata into /tmp (doc/vec/event ids offset per copy; text
gets a per-copy marker token so near-dup structure is preserved instead
of collapsing into exact duplicates). bench.py stays on the pristine
testdata — this tool exists ONLY to answer "does the operator's cost
curve bend?" with numbers instead of prose; results are recorded in
SCALE.md.

Usage: python tools/scale_probe.py [--factor 5] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# heavyweight, shuffle-bearing queries whose scaling curve matters
PROBES = [
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_sessionize",
    "q_session_stats",
    "q_asof_join",
    "q_agg_group_stats",
    "q_contamination",
    "q_repetition_stats",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_window_frames",
    "q_resample_ffill",
    # round-2 additions over documents/embeddings/events (the tables
    # the probe scales)
    "q_dedup_paragraphs",
    "q_dedup_minhash_incr",
    "q_semdedup",
    "q_funnel",
    "q_retention_cohorts",
    "q_bm25",
    "q_chi2_terms",
    "q_sample_weighted",
    # round-3: streaming ops over the scaled events table — state must
    # scale with keys-in-window, not stream length
    "q_stream_window_agg",
    "q_stream_sessions",
    "q_stream_join",
    "q_stream_rule3",
    # round-4: distributed exact global ordering (the shapes that used
    # to be single-partition windows — the probe proves the curve is
    # now linear-ish), the persisted band index, the portable sketch
    "q_epoch_shuffle",
    "q_length_buckets",
    "q_pack_sequences",
    "q_dedup_band_index",
    "q_hll_portable",
    # round-5: single-pass grouping-set report over the scaled corpus
    "q_cube_grouping",
    # round-6: exact-collapse banded/LSH embedding dedup (the 25x probe
    # found the pre-collapse 150x blow-up), the persisted inverted
    # index probe, and the new curation stages
    "q_dedup_embedding_bands",
    "q_dedup_embedding_lsh",
    "q_bm25_index",
    "q_dedup_survivors",
    "q_split_holdout",
    "q_corpus_diff",
    "q_html_extract",
    # round-7: the one-commit raw->shards composition (its warehouse is
    # keyed per source version, so run 1 measures the full build and
    # later runs the steady-state refresh with the export token-skip)
    "q_corpus_pipeline_full",
]

_STREAM_VIEWS = (
    "stream_win_agg", "stream_sessions", "stream_join", "stream_rule3",
)

OFF = 1_000_000_000


def build_scaled(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    from etl_fraud_detection_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")

    def rep(df, build):
        parts = [build(df, k) for k in range(factor)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    rep(
        docs,
        lambda d, k: d.select(
            (F.col("doc_id") + k * OFF).alias("doc_id"),
            # marker token keeps copies NEAR-duplicate, not exact
            F.concat(F.col("text"), F.lit(f" rep{k}")).alias("text"),
            "lang", "source",
            (F.col("n_chars") + len(f" rep{0}")).alias("n_chars"),
        ),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    rep(
        emb,
        lambda d, k: d.select(
            (F.col("vec_id") + k * OFF).alias("vec_id"), "embedding", "label"
        ),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    rep(
        ev,
        lambda d, k: d.select(
            (F.col("event_id") + k * OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + k * OFF).alias("user_id"),
            "event_type", "value", "props",
        ),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--keep", action="store_true",
        help="reuse an existing scaled dir and leave it on disk afterwards "
        "(lets a large-factor probe run as several short invocations)",
    )
    ap.add_argument("names", nargs="*", help="probe only these queries")
    args = ap.parse_args()

    from etl_fraud_detection_spark.catalog import load_table  # noqa: F401
    from etl_fraud_detection_spark.plans.queries import QUERIES
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = os.path.join("/tmp", f"spark_graft_scale_{args.factor}x")
    if not (args.keep and os.path.isdir(os.path.join(scaled_dir, "events.parquet"))):
        build_scaled(spark, args.sf, scaled_dir, args.factor)
    # the scaled events.parquet is a DIRECTORY; catalog.load_table and
    # the streaming readers (_stream_dir symlinks the dir, the schema
    # probe picks a part file) both handle it.

    import statistics

    print(f"# probe: {args.sf} vs {scaled_dir} ({args.factor}x), median of {args.runs}")
    print(f"| query | t_1x (s) | t_{args.factor}x (s) | ratio | rows 1x→{args.factor}x |")
    print("|---|---|---|---|---|")
    for name in (args.names or PROBES):
        fn = QUERIES[name].fn
        ts, rows = {}, {}
        for tag, d in (("1x", args.sf), (f"{args.factor}x", scaled_dir)):
            samples = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows[tag] = fn(spark, d).count()
                samples.append(time.perf_counter() - t0)
                for view in _STREAM_VIEWS:
                    try:
                        spark.catalog.dropTempView(view)
                    except Exception:
                        pass
            ts[tag] = statistics.median(samples)
        r = ts[f"{args.factor}x"] / ts["1x"]
        big = f"{args.factor}x"
        print(
            f"| {name} | {ts['1x']:.2f} | {ts[big]:.2f} | {r:.2f}x "
            f"| {rows['1x']}→{rows[big]} |"
        )

    if not args.keep:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
