"""Round-15 measurement probes.

Modes:
  hof       — is the interpreted higher-order-function lambda the
              bottleneck of the shingle / k-gram builders? Times three
              implementations of the same gram stream at sf0.1 with the
              noop sink (guide §1.4): the current F.transform lambda,
              MLlib's NGram (compiled Scala UDF), and an Arrow
              mapInPandas. Downstream md5 is included so the probe
              times the real per-gram work, not just array building.
  crossover — the band-probe crossover (r14 verdict task 4): build text
              band ledgers of increasing size, time dedup_index.ingest
              (read-only) with the static filters forced ON vs OFF at a
              fixed batch, and report wall + scan receipts. Sets the
              STATIC_PROBE_MIN_BYTES default from measurement.

Usage: python tools/probe_r15.py hof|crossover [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_fraud_detection_spark.session import get_spark  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _docs(spark, sf):
    return spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", "text"
    )


def mode_hof(spark, sf: str) -> None:
    docs = _docs(spark, sf)
    n = 3  # shingle width (dedup.NGRAM)

    def current(d):
        toks = (
            d.select("doc_id", F.split("text", " ").alias("toks"))
            .where(F.size("toks") >= n)
        )
        grams = F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " "),
        )
        return toks.select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
        ).select("doc_id", F.md5("shingle").alias("fp"))

    def mllib_ngram(d):
        from pyspark.ml.feature import NGram

        toks = (
            d.select("doc_id", F.split("text", " ").alias("toks"))
            .where(F.size("toks") >= n)
        )
        g = NGram(n=n, inputCol="toks", outputCol="grams").transform(toks)
        return g.select(
            "doc_id", F.explode(F.array_distinct("grams")).alias("shingle")
        ).select("doc_id", F.md5("shingle").alias("fp"))

    def arrow_map(d):
        import hashlib

        import pandas as pd

        def gen(batches):
            for pdf in batches:
                ids, fps = [], []
                for did, text in zip(pdf["doc_id"], pdf["text"]):
                    toks = text.split(" ")
                    if len(toks) < n:
                        continue
                    seen = set()
                    for i in range(len(toks) - n + 1):
                        g = " ".join(toks[i : i + n])
                        if g not in seen:
                            seen.add(g)
                            ids.append(did)
                            fps.append(
                                hashlib.md5(g.encode()).hexdigest()
                            )
                yield pd.DataFrame({"doc_id": ids, "fp": fps})

        return d.mapInPandas(gen, "doc_id long, fp string")

    impls = {"transform_lambda": current, "mllib_ngram": mllib_ngram,
             "arrow_map": arrow_map}
    # equality check first (gram strings + md5 must agree)
    counts = {}
    for name, fn in impls.items():
        counts[name] = (
            fn(docs).groupBy().agg(
                F.count("*").alias("n"),
                F.sum(F.conv(F.substring("fp", 1, 8), 16, 10).cast("long"))
                .alias("chk"),
            ).collect()[0]
        )
    print("equality:", {k: (v["n"], v["chk"]) for k, v in counts.items()})
    for name, fn in impls.items():
        ts = []
        for _ in range(5):
            spark.sparkContext.setJobDescription(f"hof:{name}")
            ts.append(_noop(fn(docs)))
        ts.sort()
        print(f"{name}: median={ts[2]:.3f}s  all={[round(t,3) for t in ts]}")


def mode_crossover(spark, sf: str) -> None:
    import shutil
    import tempfile

    from etl_fraud_detection_spark.operators import dedup, dedup_index
    from etl_fraud_detection_spark.pipeline import Warehouse

    docs = _docs(spark, sf)
    base = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0).persist()
    batch.count()
    scales = [1, 4, 16, 64, 256]
    print("ledger_mult | bands_MB shingles_MB | t_off(s) t_on(s) | "
          "on_scan_rows off_scan_rows")
    for mult in scales:
        root = tempfile.mkdtemp(prefix=f"xover_{mult}_")
        shutil.rmtree(root, ignore_errors=True)
        wh = Warehouse(spark, root)
        # clone the ledger mult times with disjoint ids AND distinct
        # texts (suffix word per clone) so the band space grows like a
        # real corpus instead of mass-duplicating one band key
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(10_000_000 * i)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" clone{i} tail{i}")).alias(
                    "text"
                ),
            )
            for i in range(mult)
        ]
        ledger = parts[0]
        for p in parts[1:]:
            ledger = ledger.unionByName(p)
        dedup_index.build(wh, ledger, run_id=1)
        dedup_index.optimize(wh, run_id=2)
        mb_b = (wh.table_bytes("index", "nd_bands") or 0) / 1e6
        mb_s = (wh.table_bytes("index", "nd_shingles") or 0) / 1e6

        def run(min_bytes):
            dedup.release_shingles()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = dedup_index.ingest(
                wh, batch, commit=False,
                static_probe_min_bytes=min_bytes,
            )
            df.count()
            return time.perf_counter() - t0

        # interleave OFF/ON, min-of-3 each (host-noise robust)
        offs, ons = [], []
        for _ in range(3):
            offs.append(run(1 << 60))  # gate unreachably high -> OFF
            ons.append(run(0))         # forced ON
        print(
            f"{mult:11d} | {mb_b:8.1f} {mb_s:11.1f} | "
            f"{min(offs):7.3f} {min(ons):6.3f} | "
            f"offs={[round(t,2) for t in offs]} ons={[round(t,2) for t in ons]}"
        )
        shutil.rmtree(root, ignore_errors=True)
    batch.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["hof", "crossover"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark(f"probe_r15_{args.mode}")
    spark.sparkContext.setLogLevel("ERROR")
    {"hof": mode_hof, "crossover": mode_crossover}[args.mode](spark, args.sf)
    spark.stop()


if __name__ == "__main__":
    main()
