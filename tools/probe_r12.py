"""Round-12 probes (verdict tasks 1, 2, 6).

(a) ``topk``: two-level topk_per_query A/B vs the single
    ``row_number() over (partition by query_id)`` window on a HOT-QUERY
    scored frame (one query owns ~9/10 of all candidate rows — the
    shape a mega coarse cell or a flat scan hands the ranker).
    Falsifiable: grow the frame 4x and the window's max task must grow
    ~linearly (one reducer sorts the hot query) while the two-level
    form's stays bounded (local sorts are per input partition).

(b) ``ivfpq``: IVFADC decade probe — vectors 1x -> 25x at fixed query
    count must be ~linear (the corpus-sized work is assignment+encode,
    both map-side aggregates); the MEGA-CELL fixture (3/4 of the corpus
    is one repeated vector, so one coarse cell holds 3/4 of all codes
    and the queries probe it) must not hand any reducer a cell-sized
    sort — the rank path is the two-level top-k. Also an A/B against
    flat pq_adc_topk at 25x: same codebook, same queries; IVFADC's
    search side touches nprobe/K of the code rows.

(c) ``dsirsel``: the FULL q_dsir_select (fit -> score -> Gumbel-top-k)
    at 25x — the round-11 probe covered only the weights pass; this
    closes the loop on selection. Asserts the selection stage compiles
    to TakeOrderedAndProject (per-partition top-k + k-row merge, never
    a global sort) and wall stays ~linear per token.

Usage: python tools/probe_r12.py [topk|ivfpq|dsirsel|all]
       [--rows 4000000] [--base 20000] [--factor 25]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from probe_r10 import _timed_run  # noqa: E402  (REST helpers, same UI protocol)
from probe_r11 import _corpus  # noqa: E402


def _vectors(spark, n: int, dup: bool = False) -> DataFrame:
    """n 64-dim vectors with per-dim variation and STRICTLY POSITIVE
    norms. The r11 fixture's conv(concat(id, ':', d)) truncated at the
    colon, so every dim of a vector was identical (all vectors rank-1
    collinear) and ~1/1000 ids hashed to the all-zero vector — which
    any cosine path (IVF assignment, old window shape included)
    ANSI-errors on with DIVIDE_BY_ZERO. Fine for the PQ-only r11 probe
    (unnormalized inner product, no division); fatal for IVFADC. Here
    dims hash independently on id*64+d and land in [1/1000, 999/1000].
    Dup mode: 3/4 of the corpus is ONE repeated vector — all its
    copies share a coarse cell (the mega-cell fixture)."""
    base = spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                F.when(
                    F.lit(dup) & (F.col("id") % 4 != F.lit(0)),
                    (d * 37 % 23).cast("double") / 23.0,
                ).otherwise(
                    (F.pmod(F.xxhash64(F.col("id") * 64 + d), F.lit(999))
                     + 1).cast("double") / 1000.0
                )
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.repartition(32)


def _scored_hot(spark, n: int) -> DataFrame:
    """(query_id, cand_id, cos): query 0 owns ~9/10 of all rows."""
    return spark.range(0, n).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(1 + F.col("id") % 49)
        .alias("query_id"),
        F.col("id").alias("cand_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double") / 1e5)
        .alias("cos"),
    ).repartition(32)


def _window_topk(scored: DataFrame, k: int) -> DataFrame:
    """The pre-round-12 single-window shape (executable spec for the
    A/B; bit-identical results, single-reducer sort per query)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def topk(spark, rows: int) -> None:
    from etl_fraud_detection_spark.operators import similarity

    print("## per-query top-k A/B: single window vs two-level "
          "topk_per_query (query 0 owns 9/10 of candidates)")
    print("| rows | shape | wall (s) | stage max tasks "
          "(s x tasks, worst 3) |")
    print("|---|---|---|---|")
    warm = _scored_hot(spark, 5000).persist()
    warm.count()
    order = [F.col("cos").desc(), F.col("cand_id")]
    _window_topk(warm, 5).count()
    similarity.topk_per_query(warm, 5, order).count()
    warm.unpersist()
    for n in (rows // 4, rows):
        scored = _scored_hot(spark, n).persist()
        scored.count()
        for name, frame in (
            ("old window", _window_topk(scored, 5)),
            ("new two-level", similarity.topk_per_query(scored, 5, order)),
        ):
            wall, stages, cnt = _timed_run(spark, frame)
            wall2, stages2, _ = _timed_run(spark, frame)
            if wall2 < wall:
                wall, stages = wall2, stages2
            assert cnt == 5 * 50, cnt
            top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
            print(f"| {n} | {name} | {wall:.2f} | {top} |")
        scored.unpersist()


def ivfpq(spark, base: int, factor: int) -> None:
    from etl_fraud_detection_spark.operators import similarity

    print(f"\n## IVFADC decade probe: vectors 1x -> {factor}x + "
          f"mega-cell fixture + flat-ADC A/B (m=4, K=16, nprobe=2)")
    print("| vectors | variant | wall (s) | s per 1M vectors | "
          "stage max tasks (worst 3) |")
    print("|---|---|---|---|---|")
    warm = _vectors(spark, 500).persist()
    warm.count()
    similarity.ivfpq_topk(warm, k=5, query_pred="vec_id < 10").count()
    similarity.pq_adc_topk(warm, k=5, query_pred="vec_id < 10").count()
    warm.unpersist()
    cases = [
        (base, False, "ivfpq"),
        (base * factor, False, "ivfpq"),
        (base * factor, True, "ivfpq"),
        (base * factor, False, "flat adc"),
    ]
    frames = []
    for n, dup, shape in cases:
        emb = _vectors(spark, n, dup=dup).persist()
        emb.count()
        fn = (
            similarity.ivfpq_topk
            if shape == "ivfpq"
            else similarity.pq_adc_topk
        )
        frames.append((n, dup, shape, emb, fn(emb, k=5, query_pred="vec_id < 10")))
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (n, dup, shape, _emb, out) in enumerate(frames):
            wall, stages, cnt = _timed_run(spark, out)
            assert cnt == 50, cnt
            results[i].append((wall, stages))
    for i, (n, dup, shape, emb, _out) in enumerate(frames):
        wall, stages = min(results[i], key=lambda x: x[0])
        variant = f"{shape}, {'MEGA-CELL (3/4 one vector)' if dup else 'diverse'}"
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {n} | {variant} | {wall:.2f} | {wall / (n / 1e6):.2f} "
              f"| {top} |")
        emb.unpersist()


def ivfpq_stored(spark, base: int, factor: int) -> None:
    """The cost claim that justifies IVFADC — A/B of the PERSISTED
    probes over the same stored codes: flat pq_probe ADC-scores every
    code row per query; ivfpq_probe prunes to the nprobe probed cells
    first (partition-pruned scan). Session-form decade rows (the
    ``ivfpq`` mode) carry the build-side linearity; this isolates
    SEARCH, the per-query recurring cost a production user pays."""
    import tempfile

    from etl_fraud_detection_spark.operators import ann_index
    from etl_fraud_detection_spark.pipeline import Warehouse

    n = base * factor
    print(f"\n## persisted-probe A/B at {n} vectors: flat pq_probe vs "
          f"ivfpq_probe (nprobe=2 of K=16) + mega-cell fixture")
    print("| variant | probe wall (s) | stage max tasks (worst 3) |")
    print("|---|---|---|")
    emb = _vectors(spark, n).persist()
    emb.count()
    queries = _vectors(spark, 64).where("vec_id < 10").persist()
    queries.count()
    wh_flat = Warehouse(spark, tempfile.mkdtemp(prefix="probe12_pq_"))
    ann_index.pq_build(wh_flat, emb, run_id=1, m=4, ksub=16)
    wh_ivf = Warehouse(spark, tempfile.mkdtemp(prefix="probe12_ivfpq_"))
    ann_index.ivfpq_build(wh_ivf, emb, run_id=1, m=4, ksub=16,
                          n_centroids=16)
    emb_dup = _vectors(spark, n, dup=True).persist()
    emb_dup.count()
    wh_dup = Warehouse(spark, tempfile.mkdtemp(prefix="probe12_ivfdup_"))
    ann_index.ivfpq_build(wh_dup, emb_dup, run_id=1, m=4, ksub=16,
                          n_centroids=16)
    emb.unpersist()
    emb_dup.unpersist()
    cases = [
        ("flat pq_probe", lambda: ann_index.pq_probe(wh_flat, queries, k=5)),
        ("ivfpq_probe", lambda: ann_index.ivfpq_probe(
            wh_ivf, queries, k=5, nprobe=2)),
        ("ivfpq_probe MEGA-CELL", lambda: ann_index.ivfpq_probe(
            wh_dup, queries, k=5, nprobe=2)),
    ]
    for name, fn in cases:  # warmup, uncounted
        fn().count()
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (name, fn) in enumerate(cases):
            wall, stages, cnt = _timed_run(spark, fn())
            assert cnt == 50, (name, cnt)
            results[i].append((wall, stages))
    for i, (name, _fn) in enumerate(cases):
        wall, stages = min(results[i], key=lambda x: x[0])
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {name} | {wall:.2f} | {top} |")
    queries.unpersist()


def dsirsel(spark, base: int, factor: int) -> None:
    from etl_fraud_detection_spark.operators import sampling

    print(f"\n## q_dsir_select decade probe: full fit->score->select, "
          f"corpus 1x -> {factor}x (k=60)")
    print("| docs | tokens | wall (s) | s per 1M tokens | "
          "top-k plan | stage max tasks (worst 3) |")
    print("|---|---|---|---|---|---|")
    warm = _corpus(spark, 200).persist()
    warm.count()
    sampling.dsir_select(warm, F.col("source") == "src0", k=60).count()
    warm.unpersist()
    cases = [base, base * factor]
    frames = []
    for n in cases:
        docs = _corpus(spark, n).persist()
        docs.count()
        out = sampling.dsir_select(docs, F.col("source") == "src0", k=60)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the selection must stay per-partition top-k + k-row merge —
        # a global Sort here would be the scale bug this probe exists
        # to catch
        assert "TakeOrderedAndProject" in plan, plan
        frames.append((n, docs, out))
    results = {i: [] for i in range(len(cases))}
    for _ in range(3):
        for i, (n, _docs, out) in enumerate(frames):
            wall, stages, cnt = _timed_run(spark, out)
            assert cnt == 60, cnt
            results[i].append((wall, stages))
    for i, (n, docs, _out) in enumerate(frames):
        wall, stages = min(results[i], key=lambda x: x[0])
        toks = 40 * n
        top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
        print(f"| {n} | {toks} | {wall:.2f} | {wall / (toks / 1e6):.2f} "
              f"| TakeOrderedAndProject | {top} |")
        docs.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["topk", "ivfpq", "ivfpq_stored", "dsirsel",
                             "all"])
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--base", type=int, default=20_000)
    ap.add_argument("--factor", type=int, default=25)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from etl_fraud_detection_spark.session import tune

    spark = tune(
        SparkSession.builder.appName("probe-r12")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode in ("topk", "all"):
        topk(spark, args.rows)
    if args.mode in ("ivfpq", "all"):
        ivfpq(spark, args.base, args.factor)
    if args.mode in ("ivfpq_stored", "all"):
        ivfpq_stored(spark, args.base, args.factor)
    if args.mode in ("dsirsel", "all"):
        dsirsel(spark, args.base, args.factor)
    spark.stop()


if __name__ == "__main__":
    main()
