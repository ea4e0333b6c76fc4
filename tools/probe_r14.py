"""Round-14 probes (verdict task 5): RUNTIME pruning receipts for the
persisted-index probes that, before this round, pinned their pruning
claims via plan text only. Round 13 proved plan-text pins can lie at
runtime (the DPP reuse-broadcast fallback read 64/64 partitions while
the subquery sat in the plan), so each probe here measures what the
scan actually READ — Spark UI REST inputRecords over the run's stage
window — against the stored table's row count.

Probes:
- ``bm25``   — text_index.query: static bucket isin (partition column)
  + term pushdown. Expect records-read ≈ probed buckets' postings, a
  small fraction of the postings table.
- ``zorder`` — layout.zorder_write: a literal range predicate over a
  z-ordered vs scattered layout. Expect the z layout to read a small
  fraction of what the scattered one reads (row-group stats skip).
- ``ndband`` — dedup_index.ingest probe: the band probe is an
  equi-JOIN, which alone pushes NOTHING to the stored scan (the DPP
  lesson in join form) — measured here with static_probe_keys=0
  (linear index read) vs the round-14 _static_band_filter (literal
  band-key pushdown + z-order row-group stats).
- ``mdband`` — media_index.ingest probe: the media twin of ndband.

Usage: python tools/probe_r14.py [bm25|zorder|ndband|mdband|all]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from probe_r10 import _next_stage_id, _rest  # noqa: E402


import re as _re


def _metric_int(v: str) -> int:
    m = _re.search(r"[\d,]+", v or "")
    return int(m.group().replace(",", "")) if m else 0


def _next_sql_id(spark) -> int:
    ids = [e["id"] for e in _rest(spark, "/sql?length=10000")]
    return (max(ids) + 1) if ids else 0


def _sql_scan_rows(spark, since_id: int) -> tuple[int, int]:
    """(scan output rows, files read) summed over every file-source
    scan node of every SQL execution since ``since_id`` — read from the
    SQL REST endpoint, NOT stage-level inputRecords: scans that execute
    inside broadcast-subquery threads (exactly the shape AQE gives a
    small-batch ledger probe) report stage inputRecords = 0 while the
    per-node SQL metrics stay accurate (measured while building this
    probe — the instrument itself needed a runtime receipt)."""
    rows = files = 0
    for ex in _rest(spark, "/sql?details=true&length=10000"):
        if ex["id"] < since_id:
            continue
        for node in ex.get("nodes", []):
            if not node.get("nodeName", "").startswith("Scan "):
                continue
            for m in node.get("metrics", []):
                if m.get("name") == "number of output rows":
                    rows += _metric_int(m.get("value"))
                elif m.get("name") == "number of files read":
                    files += _metric_int(m.get("value"))
    return rows, files


def _measured(spark, thunk):
    """(wall s, scan rows read, files read, result) for running thunk()
    to an action — the window covers every SQL execution the call
    spawns, including eager bounded collects inside operators."""
    q0 = _next_sql_id(spark)
    t0 = time.perf_counter()
    out = thunk()
    wall = time.perf_counter() - t0
    # SQL metrics land via the async listener bus: poll to stability
    time.sleep(0.5)
    rec = _sql_scan_rows(spark, q0)
    for _ in range(8):
        time.sleep(0.5)
        nxt = _sql_scan_rows(spark, q0)
        if nxt == rec:
            break
        rec = nxt
    return wall, rec[0], rec[1], out


def bm25(spark) -> None:
    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators import text_index
    from etl_fraud_detection_spark.pipeline import Warehouse

    print("## bm25 stored probe: records read vs postings table")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    clones = spark.range(8).select(F.col("id").alias("c"))
    big = docs.crossJoin(clones).select(
        (F.col("doc_id") + F.col("c") * 1_000_000).alias("doc_id"), "text"
    )
    root = tempfile.mkdtemp(prefix="r14_bm25_")
    wh = Warehouse(spark, root)
    text_index.build(wh, big, run_id=1)
    post = wh.read("index", "postings")
    total = post.count()
    terms = ["data", "model"]
    buckets = sorted({
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(text_index._bucket(F.col("term")).alias("b")).collect()
    })
    bucket_rows = post.where(F.col("bucket").isin(buckets)).count()
    wall, rec, files, n = _measured(
        spark, lambda: text_index.query(wh, terms, k=10).count()
    )
    print(f"| postings rows | probed-bucket rows | probe scan rows | "
          f"files read | wall (s) | topk rows |")
    print(f"|---|---|---|---|---|---|")
    print(f"| {total} | {bucket_rows} | {rec} | {files} | {wall:.2f} | {n} |")
    verdict = "PRUNED" if rec < total * 0.5 else "NOT PRUNED"
    print(f"bm25 verdict: {verdict} (read {rec}/{total} postings-table-"
          f"equivalent records; probed buckets hold {bucket_rows})")
    shutil.rmtree(root, ignore_errors=True)


def zorder(spark) -> None:
    from etl_fraud_detection_spark.operators import layout

    print("## z-order literal range: records read, scattered vs z layout")
    n = 4_000_000
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(4096)).cast("int").alias("a"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(4096)).cast("int").alias("b"),
    )
    base = tempfile.mkdtemp(prefix="r14_z_")
    scat, zord = os.path.join(base, "scat"), os.path.join(base, "zord")
    df.repartition(64).write.mode("overwrite").parquet(scat)
    layout.zorder_write(df, zord, ["a", "b"], n_files=64)
    pred = "a >= 1024 and a < 1152 and b >= 2048 and b < 2176"
    for name, path in (("scattered", scat), ("z-ordered", zord)):
        wall, rec, files, cnt = _measured(
            spark,
            lambda p=path: spark.read.parquet(p).where(pred).count(),
        )
        print(f"| {name} | rows {n} | matched {cnt} | scan rows {rec} "
              f"| files {files} | wall {wall:.2f}s |")
    shutil.rmtree(base, ignore_errors=True)


def _inflate(df, times: int, id_col: str, perturb: dict, keep: int = 2):
    """Clone the frame ``times``× with shifted ids; per clone c >= keep,
    each column in ``perturb`` is offset so clones do not collide with
    the originals (clones < keep stay identical = genuine collisions)."""
    clones = df.sparkSession.range(times).select(F.col("id").alias("_c"))
    types = dict(df.dtypes)
    out = df.crossJoin(clones)
    sel = []
    for c in df.columns:
        col = F.col(c)
        if c == id_col:
            col = (F.col(c) + F.col("_c") * 10_000_000).alias(c)
        elif c in perturb:
            moved = (
                F.concat(F.col(c), F.lit("#"), F.col("_c").cast("string"))
                if types[c] == "string"
                else F.col(c) + F.col("_c") * F.lit(perturb[c])
            )
            col = F.when(F.col("_c") < keep, F.col(c)).otherwise(moved).alias(c)
        sel.append(col)
    return out.select(*sel)


def ndband(spark) -> None:
    from etl_fraud_detection_spark.operators import dedup_index
    from etl_fraud_detection_spark.pipeline import Warehouse

    print("## dedup band-ledger probe: linear join scan vs static band filter")
    words = [f"tok{i}" for i in range(400)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[(i * 7 + j) % 400] for j in range(60)))
         for i in range(64)],
        "doc_id long, text string",
    )
    root = tempfile.mkdtemp(prefix="r14_nd_")
    wh = Warehouse(spark, root)
    dedup_index.build(wh, docs, run_id=1)
    bands_small = wh.read("index", "nd_bands").localCheckpoint()
    sh_small = wh.read("index", "nd_shingles").localCheckpoint()
    big_bands = _inflate(bands_small, 2048, "doc_id",
                         {"band_hash": 2_654_435_761})
    big_sh = _inflate(sh_small, 2048, "doc_id", {})
    wh.begin_run(2)
    wh.overwrite("index", "nd_bands", big_bands)
    wh.overwrite("index", "nd_shingles", big_sh)
    wh.commit_run(2)
    # production maintenance: z-orders the band probe key and
    # range-sorts shingles on doc_id (what the receipts measure)
    dedup_index.optimize(wh, run_id=3, band_files=64)
    total = wh.read("index", "nd_bands").count()
    sh_total = wh.read("index", "nd_shingles").count()
    print(f"(ledger: {total} band rows, {sh_total} shingle rows)")
    def batch_of(n_docs):
        return spark.createDataFrame(
            [(500_000 + i,
              " ".join(words[(i * 7 + j) % 400] for j in range(60)))
             for i in range(4, 4 + n_docs)],
            "doc_id long, text string",
        )

    print(f"| shape | batch docs | band rows | probe scan rows | "
          f"files read | wall (s) | verdicts |")
    print(f"|---|---|---|---|---|---|---|")
    for n_docs in (1, 8):
        for name, keys in (("static filter", 1024),
                           ("join only (pre-r14)", 0)):
            # collect(), not count(): the admission frame is batch
            # LEFT JOIN verdict columns — a bare count lets Catalyst
            # ELIMINATE the whole probe join (cardinality-preserving
            # left join), measuring nothing
            wall, rec, files, n = _measured(
                spark,
                lambda k=keys, nd=n_docs: len(dedup_index.ingest(
                    wh, batch_of(nd), commit=False, static_probe_keys=k
                ).collect()),
            )
            print(f"| {name} | {n_docs} | {total} | {rec} | {files} "
                  f"| {wall:.2f} | {n} |")
    shutil.rmtree(root, ignore_errors=True)


def mdband(spark) -> None:
    from etl_fraud_detection_spark.functions import png
    from etl_fraud_detection_spark.operators import media_index
    from etl_fraud_detection_spark.operators.multimodal import MEDIA_SCHEMA
    from etl_fraud_detection_spark.pipeline import Warehouse

    print("## media band-ledger probe: linear join scan vs static band filter")
    W, H = 12, 10

    def px(seed, bump=None):
        b = bytearray((x * 29 + y * 57 + seed * 83) % 256
                      for y in range(H) for x in range(W))
        if bump is not None:
            b[bump] = (b[bump] + 40) % 256
        return bytes(b)

    media = spark.createDataFrame(
        [(i, "png", W, H, png.encode_png(W, H, 1, px(i))) for i in range(48)],
        MEDIA_SCHEMA,
    )
    root = tempfile.mkdtemp(prefix="r14_md_")
    wh = Warehouse(spark, root)
    media_index.build(wh, media, run_id=1)
    bands_small = wh.read("index", "md_bands").localCheckpoint()
    hashes_small = wh.read("index", "md_hashes").localCheckpoint()
    big_bands = _inflate(bands_small, 4096, "media_id",
                         {"band_val": 7_919})
    big_hashes = _inflate(hashes_small, 4096, "media_id", {})
    wh.begin_run(2)
    wh.overwrite("index", "md_bands", big_bands)
    wh.overwrite("index", "md_hashes", big_hashes)
    wh.overwrite("index", "md_admitted",
                 big_hashes.select("media_id").distinct())
    wh.commit_run(2)
    media_index.optimize(wh, run_id=3, band_files=64)
    total = wh.read("index", "md_bands").count()
    batch = spark.createDataFrame(
        [(900_000 + i, "png", W, H,
          png.encode_png(W, H, 1, px(i, bump=17 if i < 4 else None)))
         for i in range(8)],
        MEDIA_SCHEMA,
    )
    print(f"| shape | band rows | probe scan rows | files read | "
          f"wall (s) | verdicts |")
    print(f"|---|---|---|---|---|---|")
    rows = {}
    for name, keys in (("static filter", 1024), ("join only (pre-r14)", 0)):
        wall, rec, files, n = _measured(
            spark,
            lambda k=keys: len(media_index.ingest(
                wh, batch, commit=False, static_probe_keys=k
            ).collect()),  # collect: a bare count would eliminate the probe join
        )
        rows[name] = rec
        print(f"| {name} | {total} | {rec} | {files} | {wall:.2f} | {n} |")
    print(f"mdband verdict: join-only read {rows['join only (pre-r14)']} "
          f"scan rows, static filter read {rows['static filter']} "
          f"(bands table: {total})")
    shutil.rmtree(root, ignore_errors=True)


def opq_prod(spark, rows: int = 2_000_000, n_queries: int = 16) -> None:
    """OPQ at production scale (round-13 verdict task 3): the rotated
    IVFADC composition vs same-config raw IVFADC at 2M vectors — the
    receipt for 'the rotation folds into the codes and LUT at zero
    query-time cost', plus the flat OPQ probe's corpus-scan shape for
    contrast. Same fixture discipline as probe_r13.ivfpq_prod
    (unit-norm clustered vectors, ~10-member clusters, trained
    quantizers from a 50k sample, interleaved min-of-3)."""
    from probe_r13 import _cvectors, _recall

    from etl_fraud_detection_spark.operators import ann_index, similarity
    from etl_fraud_detection_spark.pipeline import Warehouse

    m, ksub, kk, K = 8, 64, 10, 256
    print(f"## OPQ x IVFADC at {rows} vectors (m={m}, ksub={ksub}, "
          f"K={K}, {n_queries} queries, k={kk})")
    emb = _cvectors(spark, rows).persist()
    emb.count()
    queries = emb.where(f"vec_id < {n_queries}").persist()
    queries.count()

    sample = emb.where("vec_id % 40 = 7").persist()
    sample.count()
    t0 = time.perf_counter()
    R = similarity.opq_rotation(sample, m=m)
    rot_sample = similarity.rotate_vecs(sample, R).localCheckpoint()
    print(f"# rotation training (PCA on 50k sample): "
          f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    books_raw = similarity.pq_codebooks_kmeans(sample, m=m, ksub=ksub,
                                               seed=42, max_iter=5)
    cen_raw = similarity.kmeans_centroids(sample, n_centroids=K, seed=7,
                                          max_iter=5)
    books_rot = similarity.pq_codebooks_kmeans(rot_sample, m=m, ksub=ksub,
                                               seed=42, max_iter=5)
    cen_rot = similarity.kmeans_centroids(rot_sample, n_centroids=K,
                                          seed=7, max_iter=5)
    print(f"# quantizer training raw+rotated: "
          f"{time.perf_counter() - t0:.1f}s")
    sample.unpersist()

    t0 = time.perf_counter()
    wh_raw = Warehouse(spark, tempfile.mkdtemp(prefix="r14_ivfraw_"))
    ann_index.ivfpq_build(wh_raw, emb, run_id=1, m=m, ksub=ksub,
                          centroids=cen_raw, codebooks=books_raw)
    wh_rot = Warehouse(spark, tempfile.mkdtemp(prefix="r14_ivfrot_"))
    ann_index.ivfpq_build(wh_rot, emb, run_id=1, m=m, ksub=ksub,
                          centroids=cen_rot, codebooks=books_rot,
                          rotation=R)
    wh_opq = Warehouse(spark, tempfile.mkdtemp(prefix="r14_opqflat_"))
    ann_index.opq_build(wh_opq, emb, run_id=1, m=m, ksub=ksub,
                        rotation=R, codebooks=books_rot)
    print(f"# index builds (raw IVFADC + rotated IVFADC + flat OPQ): "
          f"{time.perf_counter() - t0:.1f}s")

    truth: dict[int, set[int]] = {}
    t0 = time.perf_counter()
    for r in similarity.brute_force_topk(
        emb, k=kk, query_pred=f"vec_id < {n_queries}"
    ).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    print(f"# exact ground truth: {time.perf_counter() - t0:.1f}s")

    cases = [(f"raw K={K} np={np}", wh_raw, np) for np in (1, 4)]
    cases += [(f"OPQxIVF K={K} np={np}", wh_rot, np) for np in (1, 4)]
    cases.append(("flat OPQ (corpus scan)", wh_opq, None))

    def probe_df(wh, nprobe):
        if nprobe is None:
            return ann_index.opq_probe(wh, queries, k=kk)
        return ann_index.ivfpq_probe(wh, queries, k=kk, nprobe=nprobe)

    for _name, wh, np_ in cases:  # codegen warmup, uncounted
        probe_df(wh, np_).count()

    walls: dict[str, list[float]] = {n: [] for n, _, _ in cases}
    scans: dict[str, int] = {}
    for _ in range(3):  # interleaved min-of-3
        for name, wh, np_ in cases:
            df = probe_df(wh, np_)
            q0 = _next_sql_id(spark)
            t0 = time.perf_counter()
            cnt = df.count()
            walls[name].append(time.perf_counter() - t0)
            assert cnt == kk * n_queries, (name, cnt)
            time.sleep(0.5)
            scans[name] = _sql_scan_rows(spark, q0)[0]

    n_codes = rows * m
    print(f"| config | probe wall s (min of 3) | scan rows "
          f"(codes table = {n_codes:,}) | recall@{kk} | +rerank k'=50 |")
    print("|---|---|---|---|---|")
    res = {}
    for name, wh, np_ in cases:
        got = probe_df(wh, np_).collect()
        rec = _recall(got, truth)
        if np_ is None:
            rr = ""
        else:
            short = (
                ann_index.ivfpq_probe(wh, queries, k=50, nprobe=np_)
                .select("query_id", "cand_id").localCheckpoint()
            )
            rr = (f"{_recall(similarity.ann_rerank(emb, short, k=kk).collect(), truth):.3f}")
        res[name] = (min(walls[name]), scans[name], rec)
        print(f"| {name} | {min(walls[name]):.2f} | {scans[name]:,} | "
              f"{rec:.3f} | {rr} |")

    # the zero-query-time-cost claim, pinned as a receipt: the rotated
    # probe's wall and scan volume track the raw probe's at the same
    # K/nprobe (rotation cost is d folds over Q bounded query rows)
    for np_ in (1, 4):
        rw, rs, _ = res[f"raw K={K} np={np_}"]
        ow, os_, _ = res[f"OPQxIVF K={K} np={np_}"]
        assert ow < rw * 1.8 + 0.5, (np_, rw, ow)
        assert os_ < rs * 2 + 10_000, (np_, rs, os_)
    # the flat OPQ probe reads the whole code table — the shape the
    # composition exists to avoid
    assert scans["flat OPQ (corpus scan)"] > n_codes * 0.9
    print("# receipts passed: rotated wall/scan track raw at same "
          "K/nprobe; flat OPQ scans the full code table")
    emb.unpersist()
    queries.unpersist()


def spreads(spark) -> None:
    """Round-13 verdict task 6: q_ann_pq_adc and q_fraud4 regressed
    ~0.5s within their recorded interleaved spread with NO code change
    that round — one clean interleaved min-of-3 on an idle host, with
    two stable peers as controls, settles weather vs regression."""
    import statistics

    from etl_fraud_detection_spark.plans.queries import QUERIES

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ["q_ann_pq_adc", "q_fraud4", "q_ann_ivfpq_index", "q_fraud3"]
    print(f"## spreads re-measure (interleaved min-of-3, {sf})")
    for n in names:  # warmup: fixture builds + codegen, uncounted
        QUERIES[n].fn(spark, sf).count()
    walls: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, sf).count()
            walls[n].append(time.perf_counter() - t0)
    print("| query | min | median | max | r13 bench median |")
    print("|---|---|---|---|---|")
    r13 = {"q_ann_pq_adc": 1.78, "q_fraud4": 1.48,
           "q_ann_ivfpq_index": 1.6, "q_fraud3": None}
    for n in names:
        w = sorted(walls[n])
        ref = r13.get(n)
        print(f"| {n} | {w[0]:.2f} | {statistics.median(w):.2f} | "
              f"{w[-1]:.2f} | {ref if ref else '-'} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", nargs="?", default="all",
                    choices=["bm25", "zorder", "ndband", "mdband",
                             "opq_prod", "spreads", "all"])
    args = ap.parse_args()
    from pyspark.sql import SparkSession

    from etl_fraud_detection_spark.session import tune

    spark = tune(
        SparkSession.builder.appName("probe-r14")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    todo = (["bm25", "zorder", "ndband", "mdband"]
            if args.probe == "all" else [args.probe])  # opq_prod only explicit
    for name in todo:
        globals()[name](spark)


if __name__ == "__main__":
    main()

