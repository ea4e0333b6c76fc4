"""Persisted IVF vector index (operators/ann_index): what distinguishes
the stored index from the pure-DataFrame ivf_topk is the lifecycle —
build once, admit batches against FROZEN centroids without ever
re-assigning old vectors, probe read-only with no KMeans job."""

import pytest

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import ann_index, similarity
from etl_fraud_detection_spark.pipeline import Warehouse


def _emb(spark, ids):
    """Deterministic unit-ish vectors: vec_id i -> 4-dim pattern."""
    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(4)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "ivfwh"))


def test_probe_matches_ivf_topk(spark, wh):
    """Stored-index probe == the session-scoped operator, bit for bit,
    for nprobe 1 and 2 (deterministic lowest-id quantizer)."""
    emb = _emb(spark, range(60))
    ann_index.build(wh, emb, run_id=1, n_centroids=8)
    for nprobe in (1, 2):
        got = {
            tuple(r)
            for r in ann_index.probe(
                wh, emb.where("vec_id < 10"), k=3, nprobe=nprobe
            ).collect()
        }
        want = {
            tuple(r)
            for r in similarity.ivf_topk(
                emb, k=3, n_centroids=8, query_pred="vec_id < 10", nprobe=nprobe
            ).collect()
        }
        assert got == want and got


def test_ingest_grows_index_without_touching_old_assignments(spark, wh):
    """Batch admission appends the batch's cells and leaves every
    pre-existing assignment row byte-identical — the frozen-quantizer
    contract that makes daily cost O(batch), not O(corpus)."""
    ann_index.build(wh, _emb(spark, range(40)), run_id=1, n_centroids=8)
    before = {r.vid: (tuple(r.vec), r.vnorm, r.cid)
              for r in wh.read("index", "ivf_assign").collect()}
    cen_before = sorted(map(tuple, wh.read("index", "ivf_centroids").collect()))

    out = ann_index.ingest(wh, _emb(spark, range(40, 55)), run_id=2)
    assert {r.vid for r in out.collect()} == set(range(40, 55))

    after = {r.vid: (tuple(r.vec), r.vnorm, r.cid)
             for r in wh.read("index", "ivf_assign").collect()}
    assert set(after) == set(range(55))
    for vid, row in before.items():
        assert after[vid] == row  # old vectors never re-assigned
    # quantizer frozen by ingest
    assert sorted(map(tuple, wh.read("index", "ivf_centroids").collect())) == cen_before

    # the probe sees the admitted vectors
    hits = {
        r.cand_id
        for r in ann_index.probe(wh, _emb(spark, range(40, 41)), k=5, nprobe=2).collect()
    }
    assert hits  # non-empty; cells now include batch vectors
    # and new vectors' assignments agree with assigning against the
    # stored centroids from scratch
    cen = wh.read("index", "ivf_centroids")
    fresh = {
        (r.vid, r.cid)
        for r in ann_index._assign(
            ann_index._vrows(_emb(spark, range(40, 55)), "vec_id", "embedding"), cen
        ).select("vid", "cid").collect()
    }
    assert {(vid, after[vid][2]) for vid in range(40, 55)} == fresh


def test_ingest_replay_is_idempotent(spark, wh):
    ann_index.build(wh, _emb(spark, range(20)), run_id=1, n_centroids=4)
    batch = _emb(spark, range(20, 30))
    ann_index.ingest(wh, batch, run_id=2)
    n1 = wh.read("index", "ivf_assign").count()
    replay = ann_index.ingest(wh, batch, run_id=3)  # redelivery
    assert replay.count() == 0
    assert wh.read("index", "ivf_assign").count() == n1
    # partial overlap: only the genuinely new vid lands
    out = ann_index.ingest(wh, _emb(spark, range(29, 32)), run_id=4)
    assert {r.vid for r in out.collect()} == {30, 31}


def test_probe_plan_is_readonly_scan(spark, wh):
    """The probe must be a pure scan+join plan: stored parquet feeds
    both sides, no Python/Arrow eval nodes (no KMeans retrain, which
    would surface as extra jobs and mapInPandas/TreeAggregate nodes),
    and the corpus side is never re-assigned (no second window over
    ivf_assign rows)."""
    emb = _emb(spark, range(30))
    ann_index.build(wh, emb, run_id=1, n_centroids=4)
    plan = ann_index.probe(wh, emb.where("vec_id < 5"), k=3, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    # both stored tables feed the plan as parquet scans (locations are
    # truncated in toString, so match the tables' ReadSchema signatures;
    # cid is a PARTITION column of ivf_assign, so it is absent from its
    # ReadSchema and present in PartitionFilters instead)
    assert "vid:bigint,vec:array<float>" in plan.replace(" ", "")  # ivf_assign scan
    assert "cid:int,cen_vec:array<double>" in plan.replace(" ", "")  # ivf_centroids scan
    # the probe reads ONLY its nprobe cells' files: dynamic partition
    # pruning off the broadcast query-cells side reaches the scan
    assert "dynamicpruning" in plan, plan
    for bad in ("Python", "mapInPandas", "KMeans"):
        assert bad not in plan, f"{bad} in probe plan"


def test_kmeans_quantizer_slots_in(spark, wh):
    """build(centroids=kmeans_centroids(...)) stores the trained
    quantizer; probe and ingest run against it with no further
    training (same frozen-quantizer lifecycle)."""
    emb = _emb(spark, range(50))
    cen = similarity.kmeans_centroids(emb, n_centroids=4, seed=7, max_iter=3)
    ann_index.build(wh, emb, run_id=1, centroids=cen)
    assert wh.read("index", "ivf_centroids").count() == 4
    out = ann_index.probe(wh, emb.where("vec_id < 5"), k=3, nprobe=2)
    assert out.count() == 15  # 5 queries x top-3
    ann_index.ingest(wh, _emb(spark, range(50, 55)), run_id=2)
    assert wh.read("index", "ivf_assign").count() == 55


def test_unbuilt_warehouse_raises_clearly(spark, wh):
    emb = _emb(spark, range(5))
    with pytest.raises(ValueError, match="not built"):
        ann_index.probe(wh, emb)
    with pytest.raises(ValueError, match="not built"):
        ann_index.ingest(wh, emb, run_id=1)


def test_build_and_ingest_are_atomic(spark, wh):
    """Both tables appear in the same commit manifest — an index can
    never hold assignments without its quantizer."""
    ann_index.build(wh, _emb(spark, range(10)), run_id=41)
    m = wh._manifest(41)
    tables = {t.split("/")[-1] for t in m["tables"]}
    assert {"ivf_centroids", "ivf_assign"} <= tables


def test_partition_aware_compaction_preserves_layout_and_probes(spark, wh):
    """Batch admissions accrete per-batch files inside each cid=*/
    partition directory; compact(partition_by=["cid"]) must collapse
    them WITHOUT flattening the partition tree — the layout is what the
    probe's dynamic partition pruning prunes on — and probe results
    must be byte-identical across the rewrite."""
    import glob
    import os

    ann_index.build(wh, _emb(spark, range(40)), run_id=1, n_centroids=8)
    for b in range(3):
        ann_index.ingest(
            wh, _emb(spark, range(40 + b * 5, 45 + b * 5)), run_id=2 + b
        )
    queries = _emb(spark, range(8))
    before = sorted(map(tuple, ann_index.probe(wh, queries, k=3).collect()))

    p = wh.path("index", "ivf_assign")
    vdir = wh._vdir(p, wh._current(p))
    files_before = len(glob.glob(os.path.join(vdir, "cid=*", "*.parquet")))
    assert files_before > 0  # layout is partitioned pre-compaction

    wh.compact("index", "ivf_assign", partition_by=["cid"])

    vdir2 = wh._vdir(p, wh._current(p))
    part_files = glob.glob(os.path.join(vdir2, "cid=*", "*.parquet"))
    root_files = glob.glob(os.path.join(vdir2, "*.parquet"))
    assert part_files and not root_files  # tree survived, nothing flattened
    assert len(part_files) <= files_before
    after = sorted(map(tuple, ann_index.probe(wh, queries, k=3).collect()))
    assert after == before


def test_int8_quantization_preserves_ann_recall(spark):
    """Searching over DEQUANTIZED int8 codes must keep recall@3 >= 0.9
    vs full-precision brute force — the accuracy side of the 4x storage
    trade q_embed_quantize buys."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qz = similarity.quantize_int8(emb)
    deq = qz.select(
        "vec_id",
        F.transform(
            F.col("qvec"), lambda c: (c * F.col("scale")).cast("float")
        ).alias("embedding"),
    )
    exact = similarity.brute_force_topk(emb, k=3)
    approx = similarity.brute_force_topk(deq, k=3)
    want = {(r.query_id, r.cand_id) for r in exact.collect()}
    got = {(r.query_id, r.cand_id) for r in approx.collect()}
    assert len(want & got) / len(want) >= 0.9


def test_ingest_same_batch_duplicates_collapse(spark, wh):
    """A vid doubled WITHIN one batch must land as one assignment row —
    otherwise the duplicate scores itself in every later probe (same
    contract as dedup_index.ingest)."""
    ann_index.build(wh, _emb(spark, range(20)), run_id=1, n_centroids=4)
    out = ann_index.ingest(wh, _emb(spark, [25, 25, 26]), run_id=2)
    assert sorted(r.vid for r in out.collect()) == [25, 26]
    idx = wh.read("index", "ivf_assign")
    assert idx.where("vid = 25").count() == 1
    assert idx.where("vid = 26").count() == 1
