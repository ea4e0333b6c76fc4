"""Round-9 decade probe (verdict task 4): the INTRA-BATCH near-dup
admission stage added in round 8, measured across ledger scale with a
batch that actually CONTAINS near-dup pairs (the round-8 probes used
pair-free batches, so the CC/survivor stage never ran).

(a) text: corpus_build.admission_verdicts — a FIXED 50-page batch
    (fresh + ledger near-dups + in-batch near-dup pairs) admitted
    against corpora of N vs factor*N documents (read-only, so the
    probe + intra stage is what's timed). Expected: flat in ledger —
    the pair generator, CC and survivor pick run over batch-derived
    frames only (the pairs come from the probe's own signatures).
(b) media: media_index.ingest — fixed 50-blob batch (fresh + ledger
    near-dups + in-batch near-dup PAIRS) vs ledger of N vs factor*N
    blobs. Same expectation, same reasoning.

Usage: python tools/probe_r9.py [--factor 25] [--ledger 2000]
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


def _text_of(seed: int) -> str:
    """40 tokens of per-seed DISTINCT content (passes the quality gate:
    one stopword, mean token length in range, no punctuation). Distinct
    content matters: a shared base string across all docs saturates the
    LSH bands — that's the r6 exact-collapse stress, not this probe."""
    return " ".join(
        ["the"]
        + [f"tok{(seed * 1_000_003 + j * 131) % 99_999_989}x"
           for j in range(39)]
    )


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _html(i: int, text: str) -> tuple[int, str]:
    return (
        i,
        f"<html><head><title>Doc {i}</title></head><body>"
        f"<h1>Doc {i}</h1><p>{text}</p></body></html>",
    )


def _corpus_pages(spark, n: int):
    """n distinct long-enough pages, ids 0..n-1, generated in executors."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = [_html(int(i), _text_of(int(i))) for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r[0] for r in rows], "html": [r[1] for r in rows]}
            )

    return spark.range(0, n).repartition(32).mapInPandas(
        batches, schema="doc_id long, html string"
    )


def _probe_batch(spark, n_pairs: int = 12):
    """Fixed 50-page batch: 16 fresh, 10 near-dups of ledger docs
    0..9 (one appended word), and n_pairs IN-BATCH near-dup pairs
    (pair member B = member A + one appended word, content the ledger
    lacks) — the stage under test must cluster these."""
    rows = []
    for j in range(16):
        rows.append(_html(9_000_000 + j, _text_of(5_000_000 + j)))
    for j in range(10):  # near-dup of ledger doc j: one appended token
        rows.append(_html(9_100_000 + j, _text_of(j) + " extrax"))
    for p in range(n_pairs):  # in-batch pair: content the ledger lacks
        t = _text_of(6_000_000 + p)
        rows.append(_html(9_200_000 + 2 * p, t))
        rows.append(_html(9_200_001 + 2 * p, t + " appendedx"))
    return spark.createDataFrame(rows, "doc_id long, html string")



def _px_of(seed: int, bump: bool = False) -> bytes:
    """Per-(pixel, seed) splitmix mix — consecutive seeds must produce
    INDEPENDENT patterns: an affine-in-seed formula only adds a
    constant to every gray, which aHash (threshold vs mean) is
    invariant to, collapsing 50k 'distinct' blobs onto a handful of
    hashes (measured: min pairwise Hamming 0; with this mix, 13)."""
    m = (1 << 64) - 1
    out = bytearray()
    for i in range(W * H):
        v = (i * 0x9E3779B97F4A7C15 + seed * 0xBF58476D1CE4E5B9) & m
        v ^= v >> 31
        v = v * 0x94D049BB133111EB & m
        v ^= v >> 29
        out.append(v & 0xFF)
    if bump:
        out[17] = (out[17] + 40) % 256
    return bytes(out)

def _media_frame(spark, n: int, start: int = 0):
    import pandas as pd

    from etl_fraud_detection_spark.functions import png

    def batches(it):
        for pdf in it:
            payloads = []
            for mid in pdf["id"]:
                payloads.append(
                    png.encode_png(W, H, 1, _px_of(int(mid) - start))
                )
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


def _media_batch(spark, n_pairs: int = 12):
    """50 blobs: 16 fresh, 10 near-dups of ledger seeds 0..9 (pixel
    bump), n_pairs in-batch near-dup PAIRS (shared fresh seed, second
    member bumped)."""
    import pandas as pd

    from etl_fraud_detection_spark.functions import png

    rows = []
    for j in range(16):
        rows.append((9_000_000 + j, 7_000_000 + j, False))
    for j in range(10):
        rows.append((9_100_000 + j, j, True))  # ledger seed, bumped
    for p in range(n_pairs):
        rows.append((9_200_000 + 2 * p, 8_000_000 + p, False))
        rows.append((9_200_001 + 2 * p, 8_000_000 + p, True))

    pdf = pd.DataFrame(
        {
            "media_id": [r[0] for r in rows],
            "kind": "png",
            "width": W,
            "height": H,
            "payload": [png.encode_png(W, H, 1, _px_of(r[1], r[2]))
                        for r in rows],
        }
    )
    return spark.createDataFrame(pdf)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=25)
    ap.add_argument("--ledger", type=int, default=2000)
    ap.add_argument("--skip-text", action="store_true")
    ap.add_argument("--skip-media", action="store_true")
    args = ap.parse_args()

    from etl_fraud_detection_spark.operators import corpus_build, media_index
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.pipeline import Warehouse
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("probe-r9")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_text:
        print("## admission_verdicts with IN-BATCH pairs: fixed 50-page "
              "batch vs corpus size")
        print("| corpus docs | build (s) | admit probe (s) | verdicts |")
        print("|---|---|---|---|")
        for n in (args.ledger, args.ledger * args.factor):
            root = tempfile.mkdtemp(prefix="probe_admit_")
            wh = Warehouse(spark, root)
            t_build, _ = _timed(lambda: corpus_build.build_corpus(
                wh, _corpus_pages(spark, n), run_id=1, tau=0.8,
                target_tokens=2048, with_ledger=True,
            ))
            batch = _probe_batch(spark).localCheckpoint()

            def probe():
                v = corpus_build.admission_verdicts(wh, batch, tau=0.8)
                out = tuple(
                    sorted(
                        (r["status"], r["n"])
                        for r in v.groupBy("status").agg(
                            F.count("*").alias("n")
                        ).collect()
                    )
                )
                release_shingles()
                return out

            t1, v1 = _timed(probe)
            t2, v2 = _timed(probe)
            assert v1 == v2, (v1, v2)
            print(f"| {n} | {t_build:.2f} | {min(t1, t2):.2f} | {v1} |")
            shutil.rmtree(root, ignore_errors=True)
        print()

    if not args.skip_media:
        print("## media_index.ingest with IN-BATCH pairs: fixed 50-blob "
              "batch vs ledger size")
        print("| ledger blobs | build (s) | ingest probe (s) | verdicts |")
        print("|---|---|---|---|")
        for n in (args.ledger, args.ledger * args.factor):
            root = tempfile.mkdtemp(prefix="probe_media9_")
            wh = Warehouse(spark, root)
            t_build, _ = _timed(
                lambda: media_index.build(wh, _media_frame(spark, n), run_id=1)
            )
            batch = _media_batch(spark).localCheckpoint()

            def probe():
                adm = media_index.ingest(wh, batch, commit=False)
                out = (
                    adm.where(~F.col("admitted")).count(),
                    adm.count(),
                )
                release_shingles()
                return out

            t1, v1 = _timed(probe)
            t2, v2 = _timed(probe)
            assert v1 == v2, (v1, v2)
            print(f"| {n} | {t_build:.2f} | {min(t1, t2):.2f} "
                  f"| rejected {v1[0]} of {v1[1]} |")
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
