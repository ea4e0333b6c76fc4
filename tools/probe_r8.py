"""Round-8 scale probes (SCALE.md evidence, verdict task 3):

(a) media_index.ingest — the SAME fixed batch admitted against a
    ledger of N vs factor*N blobs (read-only WHAT-IF mode, so the
    probe + the new intra-batch stage is what's timed, not the
    appends). Expected shape: near-flat — batch decode and banded
    probe work are O(batch), the ledger side is one columnar scan of
    compact signature tables (pre-bucketed at real scale).
(b) zorder_write + stats-pruned box query at 1x vs factor*x document
    volume: write wall (one range shuffle — expect ~linear) and the
    PRUNING FRACTION (files with matches / total files) for a fixed
    fractional box — expect the fraction to stay small and flat, which
    is the property the layout exists for.

Usage: python tools/probe_r8.py [--factor 25] [--ledger 2000]
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

W, H = 16, 12


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _media_frame(spark, n: int, start: int = 0, bump_every: int | None = None):
    """n synthetic PNG blobs encoded IN EXECUTORS (Arrow batches) —
    media_id = start..start+n, pixel pattern keyed by the id so content
    is distinct; ``bump_every`` makes every k-th blob a near-dup (one
    pixel +40) of the SAME-SEED ledger blob instead of fresh content."""
    import pandas as pd

    from etl_fraud_detection_spark.functions import png

    def batches(it):
        for pdf in it:
            payloads = []
            for mid in pdf["id"]:
                if not bump_every:
                    seed = int(mid)
                elif int(mid) % bump_every == 0:
                    seed = int(mid) - start  # reuses a ledger seed
                else:
                    seed = int(mid)  # >= start: content the ledger lacks
                # seed-unique pattern: the x*y*(seed//256) term breaks
                # the mod-256 period, so distinct seeds give distinct
                # images (a plain additive term collides every 256)
                px = bytearray(
                    (x * 29 + y * 57 + seed * 83 + x * y * (seed // 256)) % 256
                    for y in range(H)
                    for x in range(W)
                )
                if bump_every and int(mid) % bump_every == 0:
                    px[17] = (px[17] + 40) % 256  # near (not exact) dup
                payloads.append(png.encode_png(W, H, 1, bytes(px)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "kind": "png",
                    "width": W,
                    "height": H,
                    "payload": payloads,
                }
            )

    return (
        spark.range(start, start + n)
        .repartition(32)
        .mapInPandas(
            batches,
            schema="media_id long, kind string, width int, height int, "
            "payload binary",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=25)
    ap.add_argument("--ledger", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators import layout, media_index
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.pipeline import Warehouse
    from etl_fraud_detection_spark.session import get_spark
    from scale_probe import build_scaled

    spark = get_spark("probe-r8")
    spark.sparkContext.setLogLevel("ERROR")

    print("## media_index.ingest: fixed batch vs ledger size")
    print("| ledger blobs | build (s) | ingest probe (s) | rejected |")
    print("|---|---|---|---|")
    for n in (args.ledger, args.ledger * args.factor):
        root = tempfile.mkdtemp(prefix="probe_media_")
        wh = Warehouse(spark, root)
        t_build, _ = _timed(
            lambda: media_index.build(wh, _media_frame(spark, n), run_id=1)
        )
        # batch: every 2nd blob near-dups a ledger blob (seed reuse +
        # one-pixel bump), the rest are fresh content
        batch = _media_frame(
            spark, args.batch, start=10_000_000, bump_every=2
        ).localCheckpoint()

        def probe():
            adm = media_index.ingest(wh, batch, commit=False)
            out = adm.where(~F.col("admitted")).count()
            release_shingles()
            return out

        t1, rej = _timed(probe)
        t2, _ = _timed(probe)
        print(f"| {n} | {t_build:.2f} | {min(t1, t2):.2f} | {rej} |")
        shutil.rmtree(root, ignore_errors=True)

    print()
    print("## zorder_write + stats-pruned probes vs corpus size")
    print(
        "| corpus | write (s) | box: z / x-sort | n_chars-only: z / x-sort "
        "| box rows |"
    )
    print("|---|---|---|---|---|")
    scaled = os.path.join("/tmp", f"spark_graft_scale_{args.factor}x")
    if not os.path.isdir(os.path.join(scaled, "documents.parquet")):
        build_scaled(spark, args.sf, scaled, args.factor)
    for tag, d in (("1x", args.sf), (f"{args.factor}x", scaled)):
        docs = load_table(spark, d, "documents").select("doc_id", "n_chars")
        lo, hi, clo, chi = docs.agg(
            F.min("doc_id"), F.max("doc_id"), F.min("n_chars"), F.max("n_chars")
        ).collect()[0]
        zdir = tempfile.mkdtemp(prefix="probe_z_")
        ndir = tempfile.mkdtemp(prefix="probe_n_")
        t_w, _ = _timed(
            lambda: layout.zorder_write(docs, zdir, ["doc_id", "n_chars"],
                                        n_files=32)
        )
        (
            docs.repartitionByRange(32, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite").parquet(ndir)
        )
        # fixed fractional predicates: a 2D box (middle 1/8 of each
        # axis) and a SECOND-column-only band — the case a single-column
        # sort cannot prune at all (every x-file spans the full y range)
        ybond = (
            (F.col("n_chars") >= clo + (chi - clo) * 7 // 16)
            & (F.col("n_chars") < clo + (chi - clo) * 9 // 16)
        )
        box = (
            (F.col("doc_id") >= lo + (hi - lo) * 7 // 16)
            & (F.col("doc_id") < lo + (hi - lo) * 9 // 16)
        ) & ybond

        def hit(path, pred):
            return (
                spark.read.parquet(path).where(pred)
                .select(F.input_file_name()).distinct().count()
            )

        rows = spark.read.parquet(zdir).where(box).count()
        print(
            f"| {tag} | {t_w:.2f} "
            f"| {hit(zdir, box)} / {hit(ndir, box)} of 32 "
            f"| {hit(zdir, ybond)} / {hit(ndir, ybond)} of 32 "
            f"| {rows} |"
        )
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(ndir, ignore_errors=True)


if __name__ == "__main__":
    main()
