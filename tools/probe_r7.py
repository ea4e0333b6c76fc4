"""Round-7 scale probes (SCALE.md evidence, verdict task 3):

(a) export_shards wall vs corpus size — FRESH warehouse per
    measurement so the write path is what's timed (the catalog query
    q_export_shards deliberately reuses its warehouse and so measures
    the steady-state token-skip after its first run), plus the skip
    cost itself at both scales.
(b) media banded-Hamming pairs under exact-duplicate saturation
    (every payload present in K byte-identical copies): collapse_exact
    on vs off — the same regime that exposed the 150x embedding
    blow-up in round 6.

Usage: python tools/probe_r7.py [--factor 25] [--sat 200,1000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=25)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--sat", default="200,1000")
    args = ap.parse_args()

    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators import export, multimodal
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.pipeline import Warehouse
    from etl_fraud_detection_spark.session import get_spark
    from scale_probe import build_scaled

    spark = get_spark("probe-r7")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = os.path.join("/tmp", f"spark_graft_scale_{args.factor}x")
    if not os.path.isdir(os.path.join(scaled, "documents.parquet")):
        build_scaled(spark, args.sf, scaled, args.factor)

    print("## export_shards: fresh-warehouse write + steady-state skip")
    print("| corpus | write (s) | skip (s) | n_rows | n_shards |")
    print("|---|---|---|---|---|")
    for tag, d in (("1x", args.sf), (f"{args.factor}x", scaled)):
        docs = load_table(spark, d, "documents")
        root = tempfile.mkdtemp(prefix="probe_export_")
        wh = Warehouse(spark, root)
        t_write, res = _timed(
            lambda: export.export_shards(
                wh, docs, 1, size_col="n_chars", target_bytes=16384
            )
        )
        t_skip, res2 = _timed(
            lambda: export.export_shards(
                wh, docs, 2, size_col="n_chars", target_bytes=16384
            )
        )
        assert res2["skipped"]
        print(
            f"| {tag} | {t_write:.2f} | {t_skip:.2f} "
            f"| {res['n_rows']} | {res['n_shards']} |"
        )
        shutil.rmtree(root, ignore_errors=True)

    print()
    print("## media banded-Hamming pairs, K byte-identical copies per payload")
    print("| K | collapse on (s) | collapse off (s) | pairs |")
    print("|---|---|---|---|")
    from etl_fraud_detection_spark.plans.queries_ext import _media_df

    media = _media_df(spark)
    for k in [int(x) for x in args.sat.split(",")]:
        sat = (
            spark.range(k)
            .crossJoin(media)
            .select(
                (F.col("media_id") + F.col("id") * 100000).alias("media_id"),
                *[c for c in media.columns if c != "media_id"],
            )
        )
        hashes = multimodal.perceptual_hash(sat).persist()
        hashes.count()  # decode once, outside both timings
        t_on, n_on = _timed(
            lambda: multimodal.hamming_near_dup_pairs(hashes).count()
        )
        release_shingles()
        t_off, n_off = _timed(
            lambda: multimodal.hamming_near_dup_pairs(
                hashes, collapse_exact=False
            ).count()
        )
        assert n_on == n_off, (n_on, n_off)
        print(f"| {k} | {t_on:.2f} | {t_off:.2f} | {n_on} |")
        hashes.unpersist()


if __name__ == "__main__":
    main()
