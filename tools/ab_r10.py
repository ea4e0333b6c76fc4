"""Round-10 same-boot steady-state admission A/B (verdict task 4).

Measures the PAIR-FREE daily-batch admission cost (the steady-state
shape: no same-day twins, so the tiered emptiness probe must prove
pair-freeness as cheaply as possible) on a given TREE, against the
same committed sf0.1 corpus fixture. Run once per tree in separate
processes on one boot, nothing else running:

    python tools/ab_r10.py --find-pairs            # print pair ids once
    python tools/ab_r10.py --tree /root/repo --exclude 110,4370,...
    python tools/ab_r10.py --tree /tmp/r7tree --exclude 110,4370,...

Protocol = SCALE.md round 9: the q_corpus_admit fixture warehouse
(built/looked up by the TREE's own catalog query, uncounted), batch =
the %10==0 torn pages MINUS the intra-pair participant ids, 1 warm +
N samples of admission_verdicts(...).count() with bench-identical
cache hygiene between samples.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--samples", type=int, default=6)
    ap.add_argument("--exclude", default="")
    ap.add_argument("--find-pairs", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import corpus_build
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.pipeline import Warehouse
    from etl_fraud_detection_spark.plans.queries import QUERIES
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("ab-r10")
    spark.sparkContext.setLogLevel("ERROR")

    # build-or-open the committed fixture corpus via the tree's own
    # catalog query (also the JVM/codegen warmup), then locate its root
    QUERIES["q_corpus_admit"].fn(spark, SF_DIR).count()
    release_shingles()
    spark.catalog.clearCache()
    from etl_fraud_detection_spark.plans import queries_ext as qx

    import hashlib
    import tempfile

    src = os.path.join(SF_DIR, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:corpusadmit_v1".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_corpusadmit_{tag}")
    wh = Warehouse(spark, root)
    batch = qx._torn_pages(spark, SF_DIR).where(F.col("doc_id") % 10 == 0)

    if args.find_pairs:
        from etl_fraud_detection_spark.operators import dedup_index

        got = dedup_index.ingest(
            wh, _fresh_of(corpus_build, wh, batch),
            tau=0.8, commit=False, intra_pairs=True, normalize=False,
        )
        ipairs = got[1]
        ids = sorted({
            i for r in ipairs.select("a", "b").collect() for i in (r.a, r.b)
        })
        print("pair participant ids:", ",".join(map(str, ids)))
        return

    excl = [int(x) for x in args.exclude.split(",") if x]
    if excl:
        batch = batch.where(~F.col("doc_id").isin(excl))

    def sample() -> float:
        release_shingles()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        corpus_build.admission_verdicts(wh, batch, tau=0.8).count()
        return time.perf_counter() - t0

    sample()  # warm (uncounted)
    got = [sample() for _ in range(args.samples)]
    print(
        f"tree={args.tree} pair-free steady-state: "
        f"median={statistics.median(got):.3f}s "
        f"spread={max(got) - min(got):.3f}s "
        f"samples={','.join(f'{x:.2f}' for x in got)}"
    )
    spark.stop()


def _fresh_of(corpus_build, wh, batch):
    """The gate/exact-cascade survivor frame the intra stage sees —
    reproduced via the module's own helpers so pair discovery matches
    the admission path byte-for-byte."""
    from pyspark.sql import Window, functions as F

    from etl_fraud_detection_spark.operators import extraction, text

    surv = wh.read(corpus_build.LAYER, corpus_build.T_SURVIVORS)
    pages = batch.join(
        surv.select(F.col("doc_id")), ["doc_id"], "left_anti"
    )
    ext = extraction.html_extract(
        pages, html_col="html", id_cols=("doc_id",), on_error="quarantine"
    )
    body = F.expr("substring(clean_text, length(title) + 2)")
    docs = ext.where(F.col("_error").isNull()).select(
        "doc_id", body.alias("text")
    )
    kept = docs.where(text.quality_keep())
    red = text.with_pii_redaction(kept).select(
        "doc_id", F.col("redacted").alias("text"), F.md5("redacted").alias("fp")
    )
    w_fp = Window.partitionBy("fp")
    red = red.withColumn("_first", F.min("doc_id").over(w_fp))
    cand = red.where(F.col("doc_id") == F.col("_first")).select(
        "doc_id", "text", "fp"
    )
    stored = cand.join(
        surv.select("fp", F.col("doc_id").alias("sv_id")), "fp"
    ).select("doc_id")
    fresh = cand.join(stored, "doc_id", "left_anti")
    return fresh.select("doc_id", "text")


if __name__ == "__main__":
    main()
