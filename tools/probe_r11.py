"""Round-11 probes (verdict tasks 1-2).

(a) ``megacluster``: survivor-selection skew A/B. Fixture: one mega
    near-dup cluster holding 3/4 of the corpus (the 10^6-page
    boilerplate family near-dup dedup exists to catch) plus uniform
    small clusters. A/B the PRE-round-11 ``row_number() over
    (partition by cluster_id)`` shape (dedup._survivors_from_labels_
    window — every mega-cluster member lands on ONE reducer's sort)
    against the NEW map-side-combinable ``min(struct(-size, id))``
    aggregate (dedup.survivors_from_labels), reporting wall time and
    MAX TASK time (UI REST taskSummary, q=1.0). Falsifiable part:
    grow the mega-cluster 4x and the old shape's max task must grow
    ~linearly while the new shape's stays bounded.

(b) ``dsir``: q_dsir_weights corpus-growth probe — fixed target
    fraction (1/8 of docs are target-domain), corpus 1x -> 25x; wall
    must stay ~linear in corpus (flat per token). Variant ``dsir-hot``:
    a degenerate vocabulary where EVERY doc is dominated by one token
    (one hot feature slot carrying ~half of all gram occurrences) —
    partial aggregation must absorb the hot slot in the fit groupBy
    (max task bounded, wall within ~1.2x of the diverse-vocab corpus
    at equal token count).

Usage: python tools/probe_r11.py [megacluster|dsir|all]
       [--members 1000000] [--base 2000] [--factor 25]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from probe_r10 import _timed_run  # noqa: E402  (REST helpers, same UI protocol)


def _label_frame(spark, members: int, small: int = 50_000) -> DataFrame:
    """(doc_id, cluster_id, n_chars): cluster 0 holds ``members`` rows
    (the mega boilerplate family); ``small`` more rows spread over
    5k uniform clusters. Adversarial shape: STRING ids (what a real
    crawl carries) and a CONSTANT size inside the mega cluster, so
    the old window's single-reducer sort pays a full string
    comparison on every element — boilerplate copies genuinely are
    all the same length, so all-ties is the realistic case, not the
    pathological one."""
    mega = spark.range(0, members).select(
        F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
        F.lit(0).alias("cluster_id"),
        F.lit(512).alias("n_chars"),
    )
    rest = spark.range(members, members + small).select(
        F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
        (F.col("id") % 5000 + 1).alias("cluster_id"),
        (F.col("id") % 7 + 1).alias("n_chars"),
    )
    return mega.unionAll(rest).repartition(32)


def megacluster(spark, members: int) -> None:
    from etl_fraud_detection_spark.operators import dedup

    print("## survivor-selection mega-cluster A/B: row_number window "
          "vs min-struct aggregate (one cluster = 3/4 of corpus)")
    print("| mega members | shape | wall (s) | stage max tasks "
          "(s x tasks, worst 3) |")
    print("|---|---|---|---|")
    warm = _label_frame(spark, 2000, small=2000).persist()
    warm.count()
    for fn in (dedup._survivors_from_labels_window,
               dedup.survivors_from_labels):
        fn(warm.select("doc_id", "cluster_id"),
           warm.select("doc_id", "n_chars"), "doc_id", "n_chars").count()
    warm.unpersist()
    for n in (members // 4, members):
        frame = _label_frame(spark, n).persist()
        frame.count()
        labels = frame.select("doc_id", "cluster_id")
        sized = frame.select("doc_id", "n_chars")
        for name, fn in (
            ("old window", dedup._survivors_from_labels_window),
            ("new min-struct agg", dedup.survivors_from_labels),
        ):
            out = fn(labels, sized, "doc_id", "n_chars")
            wall, stages, cnt = _timed_run(spark, out)
            wall2, stages2, _ = _timed_run(spark, out)
            if wall2 < wall:
                wall, stages = wall2, stages2
            assert cnt == 5001, cnt  # mega + 5000 small clusters
            top = ", ".join(
                f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3]
            )
            print(f"| {n} | {name} | {wall:.2f} | {top} |")
        frame.unpersist()


def _corpus(spark, n: int, hot: bool = False) -> DataFrame:
    """n docs x 40 tokens, 1/8 target ('src0'). Diverse mode: tokens
    splitmix-mixed per (doc, pos) over a 2^20 vocab (slots near-uniform).
    Hot mode: every other token is the SAME word, so one hashed slot
    carries ~half of all unigram occurrences AND the dominant bigrams."""
    import pandas as pd

    def batches(it):
        m = (1 << 64) - 1

        def tok(doc: int, j: int) -> str:
            v = (doc * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & m
            v ^= v >> 31
            v = v * 0x94D049BB133111EB & m
            return f"w{(v >> 30) & 0xFFFFF:x}"

        def text(doc: int) -> str:
            if hot:
                return " ".join(
                    "the" if j % 2 else tok(doc, j) for j in range(40)
                )
            return " ".join(tok(doc, j) for j in range(40))

        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["id"],
                "source": ["src0" if i % 8 == 0 else f"src{1 + int(i) % 3}"
                           for i in pdf["id"]],
                "text": [text(int(i)) for i in pdf["id"]],
            })

    return spark.range(0, n).repartition(32).mapInPandas(
        batches, schema="doc_id long, source string, text string"
    )


def dsir(spark, base: int, factor: int) -> None:
    from etl_fraud_detection_spark.operators import sampling

    print(f"\n## q_dsir_weights decade probe: fixed target fraction "
          f"(1/8), corpus 1x -> {factor}x")
    print("| docs | tokens | vocab | wall (s) | s per 1M tokens | "
          "stage max tasks (worst 3) |")
    print("|---|---|---|---|---|---|")
    warm = _corpus(spark, 200).persist()
    warm.count()
    sampling.dsir_weights(warm, F.col("source") == "src0").count()
    warm.unpersist()
    # Interleaved min-of-3 (the bench.py round-robin discipline): the
    # first recording of this probe ran the cases sequentially and a
    # host stall landed entirely on the hot case, reading as a phantom
    # 2.7x "hot-slot penalty" that an interleaved re-run showed to be
    # ambient (hot == diverse within 15%).
    cases = [(base, False), (base * factor, False), (base * factor, True)]
    frames = []
    for n, hot in cases:
        docs = _corpus(spark, n, hot=hot).persist()
        docs.count()
        frames.append(
            (n, hot, docs,
             sampling.dsir_weights(docs, F.col("source") == "src0"))
        )
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (n, hot, _docs, out) in enumerate(frames):
            wall, stages, cnt = _timed_run(spark, out)
            assert cnt == n, (cnt, n)
            results[i].append((wall, stages))
    for i, (n, hot, docs, _out) in enumerate(frames):
        wall, stages = min(results[i], key=lambda x: x[0])
        toks = 40 * n
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {n} | {toks} | {'ONE HOT SLOT' if hot else 'diverse'} "
              f"| {wall:.2f} | {wall / (toks / 1e6):.2f} | {top} |")
        docs.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["megacluster", "dsir", "vocab", "pq", "all"])
    ap.add_argument("--members", type=int, default=1_000_000)
    ap.add_argument("--base", type=int, default=2_000)
    ap.add_argument("--factor", type=int, default=25)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from etl_fraud_detection_spark.session import tune

    spark = tune(
        SparkSession.builder.appName("probe-r11")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    if args.mode in ("megacluster", "all"):
        megacluster(spark, args.members)
    if args.mode in ("dsir", "all"):
        dsir(spark, args.base, args.factor)
    if args.mode in ("vocab", "all"):
        vocab(spark, args.base, args.factor)
    if args.mode in ("pq", "all"):
        pq(spark, args.base * 10, args.factor)
    spark.stop()


def vocab(spark, base: int, factor: int) -> None:
    """q_vocab_coverage decade probe + hot-word fixture: corpus 1x ->
    25x at fixed doc shape; hot mode makes every other token the SAME
    word (one token type = half of all occurrences — the Zipf head at
    its worst), which the groupBy(token) must absorb via partial
    aggregation (token is the one content-derived key in the plan)."""
    from etl_fraud_detection_spark.operators import corpus

    print(f"\n## q_vocab_coverage decade probe: corpus 1x -> {factor}x "
          f"+ hot-word fixture")
    print("| docs | tokens | vocab | wall (s) | s per 1M tokens | "
          "stage max tasks (worst 3) |")
    print("|---|---|---|---|---|---|")
    warm = _corpus(spark, 200).persist()
    warm.count()
    corpus.vocab_coverage(warm, k=100).count()
    warm.unpersist()
    cases = [(base, False), (base * factor, False), (base * factor, True)]
    frames = []
    for n, hot in cases:
        docs = _corpus(spark, n, hot=hot).persist()
        docs.count()
        frames.append((n, hot, docs, corpus.vocab_coverage(docs, k=100)))
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (n, hot, _docs, out) in enumerate(frames):
            wall, stages, cnt = _timed_run(spark, out)
            assert cnt == 100, cnt
            results[i].append((wall, stages))
    for i, (n, hot, docs, _out) in enumerate(frames):
        wall, stages = min(results[i], key=lambda x: x[0])
        toks = 40 * n
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {n} | {toks} | {'ONE HOT WORD' if hot else 'diverse'} "
              f"| {wall:.2f} | {wall / (toks / 1e6):.2f} | {top} |")
        docs.unpersist()


def _vectors(spark, n: int, dup: bool = False):
    """n 64-dim vectors; dup mode: 3/4 of the corpus is ONE repeated
    vector (the boilerplate-image-embedding case) — all its copies
    take identical PQ codes, the skew-shaped input for encode/probe."""
    from pyspark.sql import functions as F

    base = spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                F.when(
                    F.lit(dup) & (F.col("id") % 4 != F.lit(0)),
                    # the mega-duplicate vector (constant per dim)
                    (d * 37 % 23).cast("double") / 23.0,
                ).otherwise(
                    F.pmod(
                        F.xxhash64(
                            F.conv(
                                F.concat(
                                    F.col("id").cast("string"),
                                    F.lit(":"), d.cast("string"),
                                ), 10, 10,
                            )
                        ), F.lit(1000),
                    ).cast("double") / 1000.0
                )
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.repartition(32)


def pq(spark, base: int, factor: int) -> None:
    """PQ decade probe: encode (the corpus-sized pass) at vectors
    1x -> 25x must be linear; the mega-duplicate fixture (3/4 of the
    corpus is one repeated vector) must not create a hot reducer —
    encode groups on (vid, sub) and ADC scoring on (query_id, vid),
    both uniform row-keyed, so PQ has NO content-derived shuffle key
    anywhere (the structural reason the skew-audit class doesn't apply;
    this probe certifies it empirically)."""
    from etl_fraud_detection_spark.operators import similarity

    print(f"\n## PQ-ADC decade probe: encode+search, vectors 1x -> "
          f"{factor}x + mega-duplicate fixture")
    print("| vectors | variant | wall (s) | s per 1M vectors | "
          "stage max tasks (worst 3) |")
    print("|---|---|---|---|---|")
    warm = _vectors(spark, 500).persist()
    warm.count()
    similarity.pq_adc_topk(warm, k=5, query_pred="vec_id < 10").count()
    warm.unpersist()
    cases = [(base, False), (base * factor, False), (base * factor, True)]
    frames = []
    for n, dup in cases:
        emb = _vectors(spark, n, dup=dup).persist()
        emb.count()
        frames.append(
            (n, dup, emb,
             similarity.pq_adc_topk(emb, k=5, query_pred="vec_id < 10"))
        )
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (n, dup, _emb, out) in enumerate(frames):
            wall, stages, cnt = _timed_run(spark, out)
            assert cnt == 50, cnt
            results[i].append((wall, stages))
    for i, (n, dup, emb, _out) in enumerate(frames):
        wall, stages = min(results[i], key=lambda x: x[0])
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {n} | {'MEGA-DUP (3/4 one vector)' if dup else 'diverse'} "
              f"| {wall:.2f} | {wall / (n / 1e6):.2f} | {top} |")
        emb.unpersist()


if __name__ == "__main__":
    main()
