"""Round-10 probes (verdict tasks 1-2): skew-resilient first-occurrence
marking in fingerprint dedup.

(a) ``hotkey``: a designed hot-fingerprint fixture — ONE 8-gram (a
    boilerplate sentence) repeated 25× per doc across every doc, so a
    single md5 fingerprint carries 25·n_docs occurrences (~10⁶ at the
    default 40k docs) while every other fingerprint is unique. A/B the
    OLD ``row_number() over (partition by fp)`` shape (reconstructed
    inline — it funnels every hot occurrence into ONE reducer's sort)
    against the NEW map-side-combinable min-struct aggregate + join
    back (dedup._first_occurrence_flag), reporting wall time and MAX
    TASK time (UI REST ``taskSummary``, q=1.0). The growth check is
    the falsifiable part: multiply the hot count ×4 (docs ×4) and the
    old shape's max task must grow ~linearly while the new shape's
    stays bounded (partial aggregation collapses the hot key map-side;
    AQE skew-join splits the residual hot join partition — thresholds
    lowered to probe scale here, defaults already trigger at the
    multi-GB partitions a real 10⁶× boilerplate produces).

(b) ``decade``: q_dedup_substring's corpus-growth probe — fixed
    repetition density (every doc shares a hot boilerplate 8-gram
    AND 10% of docs duplicate another doc's span), corpus 1×→25×;
    wall time must stay ~linear in corpus (flat per token).

Usage: python tools/probe_r10.py [hotkey|decade|all] [--docs 40000]
       [--factor 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

K = 8
BOILER = " ".join(f"boiler{j}" for j in range(K))  # the hot 8-gram


def _docs(spark, n: int, blocks: int = 25, dup_every: int = 10) -> DataFrame:
    """n docs of `blocks` × [8 boilerplate + 8 unique tokens] = 16·blocks
    tokens. The boilerplate 8-gram is the hot fingerprint (blocks·n
    occurrences of one md5); unique tokens are splitmix-mixed per
    (doc, position) so every other k-gram is distinct. Every
    ``dup_every``-th doc additionally copies doc (i-1)'s first unique
    block — a fixed-density cross-doc repeated span, so the decade
    probe's dup rate is scale-invariant."""
    import pandas as pd

    def batches(it):
        m = (1 << 64) - 1

        def tok(doc: int, j: int) -> str:
            v = (doc * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & m
            v ^= v >> 31
            v = v * 0x94D049BB133111EB & m
            return f"u{(v >> 20) & 0xFFFFFFFFFF:x}"

        def text(doc: int) -> str:
            parts = []
            for b in range(blocks):
                parts.append(BOILER)
                src = doc - 1 if (b == 0 and doc % dup_every == 9) else doc
                parts.append(
                    " ".join(tok(src, b * K + j) for j in range(K))
                )
            return " ".join(parts)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "text": [text(int(i)) for i in pdf["id"]],
                }
            )

    return spark.range(0, n).repartition(32).mapInPandas(
        batches, schema="doc_id long, text string"
    )


def _substring_dedup_window_shape(docs: DataFrame, k: int = K) -> DataFrame:
    """The PRE-round-10 substring_dedup first-occurrence marking
    (row_number window on fp), reconstructed for the A/B — identical
    gram build and rebuild, only the dup-marking stage differs."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    arr = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(toks, i + 1).alias("tok"),
            F.when(
                i <= n - k, F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k)))
            ).alias("fp"),
        ),
    )
    rows = docs.select("doc_id", F.explode(arr).alias("e")).select(
        "doc_id", "e.pos", "e.tok",
        F.coalesce(
            F.col("e.fp"),
            F.concat_ws(":", F.lit("t"), F.col("doc_id"), F.col("e.pos")),
        ).alias("fp"),
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id", "pos")
    w_doc = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    marked = rows.withColumn(
        "dup", (F.row_number().over(w_fp) > 1).cast("int")
    ).withColumn("removed", F.max("dup").over(w_doc))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("removed").cast("long").alias("n_removed"),
    )


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}{path}", timeout=30
    ) as r:
        return json.loads(r.read())


def _stage_max_tasks(spark, since_stage: int) -> list[tuple[float, int, int]]:
    """(max single-task executorRunTime s, stageId, numTasks) for every
    stage completed after `since_stage`, worst first. Per-stage matters:
    the gram-build stage is uniform and bounds wall time on 32 cores in
    BOTH shapes — the skew signal is the REDUCE stage (fp window vs
    agg+join) max task."""
    out = []
    for st in _rest(spark, "/stages?status=complete"):
        sid = st["stageId"]
        if sid < since_stage:
            continue
        try:
            summ = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary"
                "?quantiles=1.0",
            )
            mt = float(summ["executorRunTime"][0])
        except Exception:
            continue
        out.append((mt / 1000.0, sid, st["numTasks"], st.get("name", "")))
    return sorted(out, reverse=True)


def _next_stage_id(spark) -> int:
    ids = [
        s["stageId"]
        for s in _rest(spark, "/stages")
    ]
    return (max(ids) + 1) if ids else 0


def _timed_run(spark, df: DataFrame):
    """(wall s, per-stage max tasks, agg row count) for evaluating df."""
    s0 = _next_stage_id(spark)
    t0 = time.perf_counter()
    cnt = df.count()
    wall = time.perf_counter() - t0
    return wall, _stage_max_tasks(spark, s0), cnt


def hotkey(spark, n_docs: int) -> None:
    from etl_fraud_detection_spark.operators import dedup

    print("## hot-fingerprint A/B: window vs min-struct agg+join "
          "(boilerplate 8-gram, 25 occurrences/doc)")
    print("| docs | hot fp rows | shape | wall (s) | stage max tasks "
          "(s x tasks, worst 3) |")
    print("|---|---|---|---|---|")
    # JIT/codegen warmup so the first measured shape isn't cold
    warm = _docs(spark, 200).persist()
    warm.count()
    _substring_dedup_window_shape(warm).count()
    dedup.substring_dedup(warm).count()
    warm.unpersist()
    for n in (n_docs // 4, n_docs):
        docs = _docs(spark, n).persist()
        docs.count()  # materialize once so generation isn't timed
        for name, frame in (
            ("old window", _substring_dedup_window_shape(docs)),
            ("new agg+join", dedup.substring_dedup(docs).select(
                "doc_id", "n_tokens", "n_removed")),
        ):
            # two runs, keep the faster (first run may pay residual
            # shuffle-cleanup / GC from the other shape)
            wall, stages, cnt = _timed_run(spark, frame)
            wall2, stages2, _ = _timed_run(spark, frame)
            if wall2 < wall:
                wall, stages = wall2, stages2
            assert cnt == n, (cnt, n)
            top = ", ".join(
                f"{mt:.2f}x{nt} {nm.split(' ')[0]}"
                for mt, _, nt, nm in stages[:3]
            )
            print(f"| {n} | {25 * n} | {name} | {wall:.2f} | {top} |")
        docs.unpersist()


def hotkey_paragraph(spark, n_docs: int) -> None:
    """Same hot-key fixture through paragraph_dedup (the 8-aligned
    boilerplate blocks are hot SEGMENT fingerprints here — every doc
    contributes 25 identical segments to one md5)."""
    from pyspark.sql import Window

    from etl_fraud_detection_spark.operators import dedup

    def window_shape(docs):
        # pre-round-10 paragraph first-occurrence (row_number window)
        toks = F.split(F.col("text"), " ")
        n_segs = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
        segs = docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n_segs, F.lit(1))),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, (i - 1) * 8 + 1, 8)
                    ),
                )
            ).alias("pos", "seg"),
        )
        w = Window.partitionBy(F.md5(F.col("seg"))).orderBy("doc_id", "pos")
        kept = segs.withColumn("kept", (F.row_number().over(w) == 1).cast("int"))
        return kept.groupBy("doc_id").agg(F.sum("kept").alias("n_kept"))

    print("\n## paragraph_dedup hot-segment A/B (same fixture: the "
          "boilerplate block IS a hot 8-token segment)")
    print("| docs | hot seg rows | shape | wall (s) | stage max tasks |")
    print("|---|---|---|---|---|")
    warm = _docs(spark, 200).persist()
    warm.count()
    window_shape(warm).count()
    dedup.paragraph_dedup(warm).count()
    warm.unpersist()
    for n in (n_docs // 4, n_docs):
        docs = _docs(spark, n).persist()
        docs.count()
        for name, frame in (
            ("old window", window_shape(docs)),
            ("new agg+join", dedup.paragraph_dedup(docs).select(
                "doc_id", "n_kept")),
        ):
            wall, stages, cnt = _timed_run(spark, frame)
            wall2, stages2, _ = _timed_run(spark, frame)
            if wall2 < wall:
                wall, stages = wall2, stages2
            assert cnt == n, (cnt, n)
            top = ", ".join(f"{mt:.2f}x{nt}" for mt, _, nt, _ in stages[:3])
            print(f"| {n} | {25 * n} | {name} | {wall:.2f} | {top} |")
        docs.unpersist()


def decade(spark, base: int, factor: int) -> None:
    from etl_fraud_detection_spark.operators import dedup

    print(f"\n## q_dedup_substring decade probe: fixed repetition "
          f"density, corpus 1x -> {factor}x")
    print("| docs | tokens | wall (s) | s per 1M tokens |")
    print("|---|---|---|---|")
    warm = _docs(spark, 200).persist()
    warm.count()
    dedup.substring_dedup(warm).count()  # JIT/codegen warmup
    warm.unpersist()
    for n in (base, base * factor):
        docs = _docs(spark, n).persist()
        docs.count()
        toks = 400 * n
        wall = min(
            _timed_run(
                spark,
                dedup.substring_dedup(docs).select("doc_id", "n_removed"),
            )[0]
            for _ in range(2)
        )
        print(f"| {n} | {toks} | {wall:.2f} | {wall / (toks / 1e6):.2f} |")
        docs.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["hotkey", "hotkey-paragraph", "decade", "all"])
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--base", type=int, default=2_000)
    ap.add_argument("--factor", type=int, default=25)
    args = ap.parse_args()

    # get_spark disables the UI; the probe needs the REST taskSummary
    # endpoint, so pre-create the session with the UI on (getOrCreate
    # in get_spark would return this one) and apply the runtime confs.
    from pyspark.sql import SparkSession

    from etl_fraud_detection_spark.session import tune

    spark = tune(
        SparkSession.builder.appName("probe-r10")
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
    # Scale AQE's skew thresholds to probe-sized data: the defaults
    # (256 MB) are sized for real clusters where a 10^6x boilerplate
    # partition is multi-GB; at probe scale the hot partition is tens
    # of MB, so mirror the same trigger proportionally.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    if args.mode in ("hotkey", "all"):
        hotkey(spark, args.docs)
    if args.mode in ("hotkey-paragraph", "all"):
        hotkey_paragraph(spark, args.docs)
    if args.mode in ("decade", "all"):
        decade(spark, args.base, args.factor)


if __name__ == "__main__":
    main()
