"""Recall-vs-cost report across every ANN variant in the engine.

One table, one corpus (the driver-generated embeddings at --sf), one
query set, exact cosine brute force as ground truth: the artifact a
user needs to CHOOSE a variant — the recall each approximation trades
for its cost class. Wall times here are single-shot local numbers for
orientation (the bench/probe records are the falsifiable perf story);
recall is exact.

Usage: python tools/recall_report.py [--sf /root/testdata/sf0.01]
       [--k 10] [--queries 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from etl_fraud_detection_spark.operators import similarity as S
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("recall-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    emb = emb.persist()
    n = emb.count()
    k, pred = args.k, f"vec_id < {args.queries}"

    truth: dict[int, set[int]] = {}
    for r in S.brute_force_topk(emb, k=k, query_pred=pred).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)

    variants = [
        ("brute force (exact)", lambda: S.brute_force_topk(
            emb, k=k, query_pred=pred)),
        ("sign-LSH 8-bit bucket", lambda: S.lsh_ann_topk(
            emb, k=k, query_pred=pred)),
        ("IVF nprobe=1 (K=16)", lambda: S.ivf_topk(
            emb, k=k, query_pred=pred, nprobe=1)),
        ("IVF nprobe=2", lambda: S.ivf_topk(
            emb, k=k, query_pred=pred, nprobe=2)),
        ("IVF nprobe=4", lambda: S.ivf_topk(
            emb, k=k, query_pred=pred, nprobe=4)),
        ("flat PQ-ADC (m=4, ksub=16)", lambda: S.pq_adc_topk(
            emb, k=k, query_pred=pred)),
        ("IVFADC raw nprobe=2", lambda: S.ivfpq_topk(
            emb, k=k, query_pred=pred, nprobe=2)),
        ("IVFADC raw nprobe=4", lambda: S.ivfpq_topk(
            emb, k=k, query_pred=pred, nprobe=4)),
        ("IVFADC residual nprobe=2", lambda: S.ivfpq_residual_topk(
            emb, k=k, query_pred=pred, nprobe=2)),
    ]
    # round 13 (verdict task 1): the TRAINED-K production configuration
    # — trained coarse quantizer at K=64, trained PQ codebooks, the
    # nprobe dial, the exact re-rank stage, and the OPQ rotation. These
    # train MLlib models, so they sit behind one shared fit each.
    cen64 = S.kmeans_centroids(emb, n_centroids=64, seed=7, max_iter=5)
    books = S.pq_codebooks_kmeans(emb, m=4, ksub=16, seed=42, max_iter=5)

    def _trained(nprobe):
        return S.ivfpq_topk(
            emb, k=k, query_pred=pred, n_centroids=64, nprobe=nprobe,
            centroids=cen64, codebooks=books,
        )

    def _trained_rerank(nprobe):
        short = (
            S.ivfpq_topk(
                emb, k=50, query_pred=pred, n_centroids=64, nprobe=nprobe,
                centroids=cen64, codebooks=books,
            ).select("query_id", "cand_id").localCheckpoint()
        )
        return S.ann_rerank(emb, short, k=k)

    variants += [
        ("IVFADC trained K=64 nprobe=1", lambda: _trained(1)),
        ("IVFADC trained K=64 nprobe=4", lambda: _trained(4)),
        ("IVFADC trained K=64 nprobe=8", lambda: _trained(8)),
        ("IVFADC trained K=64 np=4 + rerank k'=50",
         lambda: _trained_rerank(4)),
        ("OPQ rotated flat ADC (trained)", lambda: S.opq_adc_topk(
            emb, k=k, query_pred=pred, max_iter=5)),
    ]
    print(f"## ANN recall@{k} vs exact cosine — {n} vectors, "
          f"{len(truth)} queries ({args.sf})")
    print("| variant | recall@{k} | wall (s, single-shot) |"
          .replace("{k}", str(k)))
    print("|---|---|---|")
    for name, fn in variants:
        t0 = time.perf_counter()
        got: dict[int, set[int]] = {}
        for r in fn().collect():
            got.setdefault(r.query_id, set()).add(r.cand_id)
        wall = time.perf_counter() - t0
        recall = sum(
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ) / len(truth)
        print(f"| {name} | {recall:.3f} | {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
