"""One-commit corpus build (operators/corpus_build.py): raw HTML ->
training shards end-to-end, all tables under one atomic commit; a
mid-pipeline crash leaves no partial corpus version."""

import pytest

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import corpus_build, export
from etl_fraud_detection_spark.pipeline import Warehouse

BASE = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps in the warm sun for a while before it wakes up again"
)


def _pages(spark, n=30, salt=""):
    """n HTML pages: every 7th torn (truncated 2/3); ids 1,2 and 11,12
    are near-dup pairs (shared long base text, one-word tail change);
    id 5 is too short for the quality gate."""
    rows = []
    for i in range(n):
        if i == 5:
            text = "tiny doc"
        elif i in (2, 12):
            # one appended word vs doc i-1: shingle Jaccard ~ n/(n+1)
            text = (
                BASE
                + f" closing sentence {i - 1} about topic {(i - 1) * (i - 1)} and item {i + 99} {salt}".rstrip()
                + " extra"
            )
        else:
            text = BASE + f" closing sentence {i} about topic {i * i} and item {i + 100} {salt}".rstrip()
        html = (
            f"<html><head><title>Doc {i}</title></head><body>"
            f"<h1>Doc {i}</h1><p>{text}</p></body></html>"
        )
        if i % 7 == 0:
            html = html[: len(html) * 2 // 3]
        rows.append((i, html))
    return spark.createDataFrame(rows, "doc_id long, html string")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "corpuswh"))


def test_end_to_end_and_exactly_once(spark, wh):
    pages = _pages(spark)
    res = corpus_build.build_corpus(
        wh, pages, run_id=1, tau=0.8, target_tokens=64
    )
    # torn pages quarantined, short doc gated out, dup pairs collapsed
    q = wh.read("corpus", "quarantine")
    assert sorted(r.doc_id for r in q.collect()) == [0, 7, 14, 21, 28]
    surv = wh.read("corpus", "survivors").collect()
    ids = {r.doc_id for r in surv}
    assert 5 not in ids
    # near-dup pairs (1,2) and (11,12) each kept exactly one copy
    assert len(ids & {1, 2}) == 1 and len(ids & {11, 12}) == 1
    assert res["n_survivors"] == len(surv)
    # every table landed under ONE commit
    assert wh.commits() == [1]
    # shards cover exactly the train split
    shard_ids = {
        r.doc_id
        for r in wh.read("export", "training_shards").select("doc_id").collect()
    }
    assert shard_ids == {r.doc_id for r in surv if r.split == "train"}
    assert export.verify_export(
        wh, "n_bpe_tokens",
        ["doc_id", "text", "cluster_id", "n_members", "bucket", "split",
         "n_bpe_tokens"],
    ).count() == 0
    # unchanged input: shard export skips via content token
    res2 = corpus_build.build_corpus(
        wh, pages, run_id=2, tau=0.8, target_tokens=64
    )
    assert res2["skipped"]


def test_mid_pipeline_crash_leaves_no_partial_version(spark, wh, monkeypatch):
    pages = _pages(spark)
    corpus_build.build_corpus(wh, pages, run_id=1, tau=0.8, target_tokens=64)

    def snap():
        out = {}
        for layer, t in (
            ("corpus", "quarantine"), ("corpus", "survivors"),
            ("export", "training_shards"), ("export", "shard_checksums"),
            ("export", "export_manifest"),
        ):
            out[(layer, t)] = sorted(
                tuple(r) for r in wh.read(layer, t).collect()
            )
        return out

    before = snap()

    # crash INSIDE the shard-export stage of run 2 (changed corpus):
    # quarantine + survivors have already been overwritten in-run
    real = export.shard_assignments

    def boom(*a, **kw):
        raise RuntimeError("injected mid-pipeline crash")

    monkeypatch.setattr(export, "shard_assignments", boom)
    changed = _pages(spark, salt="rev2")
    with pytest.raises(RuntimeError, match="injected"):
        corpus_build.build_corpus(
            wh, changed, run_id=2, tau=0.8, target_tokens=64
        )
    monkeypatch.setattr(export, "shard_assignments", real)

    # nothing from the crashed run is visible anywhere
    wh.recover()
    assert wh.commits() == [1]
    assert snap() == before

    # and the retried run commits the new corpus as one unit
    res = corpus_build.build_corpus(
        wh, changed, run_id=2, tau=0.8, target_tokens=64
    )
    assert not res["skipped"]
    assert wh.commits() == [1, 2]
    assert snap() != before
