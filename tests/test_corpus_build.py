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
        ["doc_id", "text", "fp", "cluster_id", "n_members", "bucket",
         "split", "n_bpe_tokens"],
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


# -- incremental admission (admit_corpus_batch) ----------------------------


def _page(i, text, torn=False):
    html = (
        f"<html><head><title>Doc {i}</title></head><body>"
        f"<h1>Doc {i}</h1><p>{text}</p></body></html>"
    )
    return (i, html[: len(html) * 2 // 3] if torn else html)


def _batch_pages(spark):
    """Admission batch covering every verdict: 200 fresh; 201 exact dup
    of stored survivor 3; 202 near dup of stored 4; 203 gated; 204
    torn; 205/206 intra-batch exact pair; 207/208 intra-batch NEAR pair
    (208 longer, so it survives and 207 rejects against it)."""
    corpus_text = lambda i: BASE + (
        f" closing sentence {i} about topic {i * i} and item {i + 100}"
    )
    fresh = BASE + " a wholly new closing thought about item 9000"
    near_base = BASE + " a separate fresh remark about item 9200"
    rows = [
        _page(200, fresh),
        _page(201, corpus_text(3)),
        _page(202, corpus_text(4) + " extra"),
        _page(203, "tiny doc"),
        _page(204, corpus_text(9), torn=True),
        _page(205, BASE + " twin closing thought about item 9100"),
        _page(206, BASE + " twin closing thought about item 9100"),
        _page(207, near_base),
        _page(208, near_base + " extra"),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


@pytest.fixture()
def corpus_wh(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "admitwh"))
    corpus_build.build_corpus(
        wh, _pages(spark), run_id=1, tau=0.8, target_tokens=64,
        with_ledger=True,
    )
    return wh


def test_admission_verdicts_and_one_commit(spark, corpus_wh):
    wh = corpus_wh
    batch = _batch_pages(spark)
    shards_before = wh.read("export", "training_shards").count()
    surv_before = wh.read("corpus", "survivors").count()
    max_shard = wh.read("export", "training_shards").agg(
        F.max("shard_id")
    ).collect()[0][0]

    res = corpus_build.admit_corpus_batch(
        wh, batch, run_id=2, tau=0.8, target_tokens=64
    )
    v = {
        r.doc_id: (r.status, r.dup_of)
        for r in wh.read("corpus", "admissions").collect()
    }
    assert v[204] == ("quarantined", None)
    assert v[203] == ("gated", None)
    assert v[201] == ("exact_dup", 3)
    assert v[202] == ("near_dup", 4)
    assert v[200][0] == "admitted"
    # intra-batch exact pair: min id admitted, twin rejected against it
    assert v[205][0] == "admitted" and v[206] == ("exact_dup", 205)
    # intra-batch NEAR pair: the LONGER doc survives (208), the other
    # rejects against the in-batch winner — without this stage both
    # would admit and could straddle holdout splits
    assert v[208][0] == "admitted" and v[207] == ("near_dup", 208)
    assert res["committed"] and res["n_admitted"] == 3

    # one commit for the whole batch; survivors and ledger grew by 3
    assert wh.commits() == [1, 2]
    surv = wh.read("corpus", "survivors")
    assert surv.count() == surv_before + 3
    assert {
        r.doc_id for r in surv.where(F.col("cluster_id") == F.col("doc_id"))
        .where(F.col("doc_id") >= 200).collect()
    } == {200, 205, 208}
    # appended shards: new ids strictly after the stored max, and the
    # WHOLE grown export still verifies against its checksum table
    new_shards = wh.read("export", "training_shards").where(
        F.col("shard_id") > max_shard
    )
    n_train_new = surv.where(
        (F.col("doc_id") >= 200) & (F.col("split") == "train")
    ).count()
    assert new_shards.count() == n_train_new
    assert wh.read("export", "training_shards").count() == (
        shards_before + n_train_new
    )
    assert export.verify_export(
        wh, "n_bpe_tokens",
        ["doc_id", "text", "fp", "cluster_id", "n_members", "bucket",
         "split", "n_bpe_tokens"],
    ).count() == 0

    # a later batch near-dupping doc 200 now rejects against it
    batch2 = spark.createDataFrame(
        [_page(
            210,
            BASE + " a wholly new closing thought about item 9000 extra",
        )],
        "doc_id long, html string",
    )
    res2 = corpus_build.admit_corpus_batch(
        wh, batch2, run_id=3, tau=0.8, target_tokens=64
    )
    v2 = {
        r.doc_id: (r.status, r.dup_of)
        for r in wh.read("corpus", "admissions")
        .where(F.col("run_id") == 3).collect()
    }
    assert v2[210] == ("near_dup", 200)
    assert res2["n_admitted"] == 0 and not res2["committed"]
    # the all-rejected batch still left its audit trail (run 3 commit)
    assert wh.commits() == [1, 2, 3]


def test_admission_replay_is_idempotent(spark, corpus_wh):
    wh = corpus_wh
    batch = _batch_pages(spark)
    corpus_build.admit_corpus_batch(wh, batch, run_id=2, tau=0.8,
                                    target_tokens=64)
    state = {
        t: sorted(tuple(r) for r in wh.read(l, t).collect())
        for l, t in (
            ("corpus", "survivors"), ("export", "training_shards"),
            ("export", "shard_checksums"), ("index", "nd_bands"),
        )
    }
    res = corpus_build.admit_corpus_batch(wh, batch, run_id=3, tau=0.8,
                                          target_tokens=64)
    assert res["n_admitted"] == 0 and not res["committed"]
    # replay commits ONLY its audit rows; corpus tables are untouched
    assert wh.commits() == [1, 2, 3]
    replay_verdicts = {
        r.doc_id: r.status
        for r in wh.read("corpus", "admissions")
        .where(F.col("run_id") == 3).collect()
    }
    # replayed already-admitted docs idempotently report admitted
    assert replay_verdicts[200] == "admitted"
    assert replay_verdicts[205] == "admitted"
    assert replay_verdicts[208] == "admitted"
    # the in-batch loser keeps rejecting — now against the LEDGER,
    # where its winner was admitted
    assert replay_verdicts[207] == "near_dup"
    after = {
        t: sorted(tuple(r) for r in wh.read(l, t).collect())
        for l, t in (
            ("corpus", "survivors"), ("export", "training_shards"),
            ("export", "shard_checksums"), ("index", "nd_bands"),
        )
    }
    assert after == state


def test_admission_crash_rolls_back_whole_batch(spark, corpus_wh, monkeypatch):
    wh = corpus_wh
    state = sorted(
        tuple(r) for r in wh.read("export", "shard_checksums").collect()
    )
    real = export.shard_checksums

    def boom(*a, **kw):
        raise RuntimeError("injected admission crash")

    monkeypatch.setattr(export, "shard_checksums", boom)
    with pytest.raises(RuntimeError, match="injected admission"):
        corpus_build.admit_corpus_batch(
            wh, _batch_pages(spark), run_id=2, tau=0.8, target_tokens=64
        )
    monkeypatch.setattr(export, "shard_checksums", real)
    wh.recover()
    assert wh.commits() == [1]
    # nothing from the batch is visible: survivors, ledger, shards
    assert wh.read("corpus", "survivors").where(
        F.col("doc_id") >= 200
    ).count() == 0
    assert wh.read("index", "nd_bands").where(
        F.col("doc_id") >= 200
    ).count() == 0
    assert sorted(
        tuple(r) for r in wh.read("export", "shard_checksums").collect()
    ) == state
    assert wh.read("corpus", "admissions") is None


def test_admission_resume_without_manual_recover(spark, corpus_wh, monkeypatch):
    """A crashed admission followed by a PLAIN re-run (no manual
    recover) must not lose docs: without the rollback-at-entry, the
    crashed run's uncommitted survivors stay visible, the re-run's
    replay guard reports them 'admitted', and their shards are never
    exported — silent doc loss."""
    wh = corpus_wh
    real = export.shard_checksums

    def boom(*a, **kw):
        raise RuntimeError("injected admission crash")

    monkeypatch.setattr(export, "shard_checksums", boom)
    with pytest.raises(RuntimeError, match="injected admission"):
        corpus_build.admit_corpus_batch(
            wh, _batch_pages(spark), run_id=2, tau=0.8, target_tokens=64
        )
    monkeypatch.setattr(export, "shard_checksums", real)
    # NO manual wh.recover() — the re-run must roll back first
    res = corpus_build.admit_corpus_batch(
        wh, _batch_pages(spark), run_id=3, tau=0.8, target_tokens=64
    )
    assert res["committed"] and res["n_admitted"] == 3
    # every admitted train-split doc HAS shard rows (no silent loss)
    surv = wh.read("corpus", "survivors").where(F.col("doc_id") >= 200)
    train_ids = {
        r.doc_id for r in surv.where(F.col("split") == "train").collect()
    }
    shard_ids = {
        r.doc_id
        for r in wh.read("export", "training_shards")
        .where(F.col("doc_id") >= 200).collect()
    }
    assert shard_ids == train_ids
    assert export.verify_export(
        wh, "n_bpe_tokens",
        ["doc_id", "text", "fp", "cluster_id", "n_members", "bucket",
         "split", "n_bpe_tokens"],
    ).count() == 0


def test_rebuild_after_admission_must_not_stale_skip(spark, corpus_wh):
    """After an admission APPENDS shards, a re-run of build_corpus over
    the UNCHANGED original input must re-export, not token-skip: the
    skip would overwrite survivors back to the original set while
    training_shards kept the admitted batches — shards no longer equal
    the train split. The manifest's shards_version pin forces the
    re-export."""
    wh = corpus_wh
    corpus_build.admit_corpus_batch(
        wh, _batch_pages(spark), run_id=2, tau=0.8, target_tokens=64
    )
    res = corpus_build.build_corpus(
        wh, _pages(spark), run_id=3, tau=0.8, target_tokens=64,
        with_ledger=True,
    )
    assert not res["skipped"]
    # exactly-once restored: shards == the (rebuilt) train split
    train = {
        r.doc_id
        for r in wh.read("corpus", "survivors")
        .where(F.col("split") == "train").collect()
    }
    shards = {
        r.doc_id
        for r in wh.read("export", "training_shards").select("doc_id").collect()
    }
    assert shards == train
    # and the skip works again once versions line up
    res2 = corpus_build.build_corpus(
        wh, _pages(spark), run_id=4, tau=0.8, target_tokens=64,
        with_ledger=True,
    )
    assert res2["skipped"]


def test_admit_into_corpus_with_empty_train_split(spark, tmp_path):
    """A committed corpus whose quality gate rejected everything still
    writes an (empty) shard table; the FIRST admitted batch must start
    at shard 0 / position 0 instead of crashing on NULL aggregates."""
    wh = Warehouse(spark, str(tmp_path / "emptywh"))
    bad = spark.createDataFrame(
        [_page(i, "tiny doc") for i in range(1, 4)], "doc_id long, html string"
    )
    corpus_build.build_corpus(
        wh, bad, run_id=1, tau=0.8, target_tokens=64, with_ledger=True
    )
    assert wh.read("export", "training_shards").count() == 0
    good = spark.createDataFrame(
        [_page(10, BASE + " first real content about item 4242")],
        "doc_id long, html string",
    )
    res = corpus_build.admit_corpus_batch(
        wh, good, run_id=2, tau=0.8, target_tokens=64
    )
    assert res["committed"] and res["n_admitted"] == 1
    rows = wh.read("export", "training_shards").collect()
    # the one admitted doc may land in any split; if train, it shards
    surv = wh.read("corpus", "survivors").collect()
    assert {r.doc_id for r in surv} == {10}
    if surv[0].split == "train":
        assert [(r.shard_id, r.shuffle_pos) for r in rows] == [(0, 1)]
    else:
        assert rows == []


def test_compaction_after_admissions_preserves_integrity(spark, corpus_wh):
    """Storage maintenance on the incrementally-grown corpus: batch
    appends accrete small files in survivors / the band ledger / the
    shard table; compaction must collapse them without disturbing the
    committed content — verify_export still passes, survivors and
    verdicts unchanged, and the shard table keeps one-file-per-shard."""
    import os

    wh = corpus_wh
    corpus_build.admit_corpus_batch(
        wh, _batch_pages(spark), run_id=2, tau=0.8, target_tokens=64
    )
    surv_before = sorted(
        tuple(r) for r in wh.read("corpus", "survivors").collect()
    )
    bands_before = sorted(
        tuple(r) for r in wh.read("index", "nd_bands").collect()
    )
    wh.compact("corpus", "survivors")
    wh.compact("index", "nd_bands")
    wh.compact("export", "training_shards")
    assert sorted(
        tuple(r) for r in wh.read("corpus", "survivors").collect()
    ) == surv_before
    assert sorted(
        tuple(r) for r in wh.read("index", "nd_bands").collect()
    ) == bands_before
    # the per-shard integrity manifest still matches the rewritten files
    assert export.verify_export(
        wh, "n_bpe_tokens",
        ["doc_id", "text", "fp", "cluster_id", "n_members", "bucket",
         "split", "n_bpe_tokens"],
    ).count() == 0
    # partitioned compaction keeps the one-file-per-shard layout
    p = wh.path("export", "training_shards")
    vdir = wh._vdir(p, wh._current(p))
    for d in os.listdir(vdir):
        if d.startswith("shard_id="):
            parts = [
                f for f in os.listdir(os.path.join(vdir, d))
                if f.endswith(".parquet")
            ]
            assert len(parts) == 1, (d, parts)


def test_unicode_twin_rejected_as_exact_dup(spark, corpus_wh):
    """The NFC normalization contract (text.nfc, applied once after
    extraction): an admitted page containing NFC 'café' and a later
    batch carrying the BYTE-DIFFERENT NFD encoding of the same text
    must collide on the exact fingerprint — without the contract both
    visually-identical pages admit. Also the reverse order (NFD first)
    via the intra-batch exact stage: an NFC/NFD twin pair in ONE batch
    admits exactly one."""
    import unicodedata

    wh = corpus_wh
    nfc_text = BASE + " the café review of naïve décor item 9300"
    assert unicodedata.normalize("NFC", nfc_text) == nfc_text
    nfd_text = unicodedata.normalize("NFD", nfc_text)
    assert nfd_text != nfc_text

    # batch 1: admit the NFC page
    v1 = {
        r.doc_id: (r.status, r.dup_of)
        for r in corpus_build.admission_verdicts(
            wh, spark.createDataFrame([_page(300, nfc_text)],
                                      "doc_id long, html string")
        ).collect()
    }
    assert v1[300][0] == "admitted"
    corpus_build.admit_corpus_batch(
        wh, spark.createDataFrame([_page(300, nfc_text)],
                                  "doc_id long, html string"),
        run_id=5, tau=0.8, target_tokens=64,
    )

    # batch 2: the NFD twin rejects as an exact dup of the stored page
    v2 = {
        r.doc_id: (r.status, r.dup_of)
        for r in corpus_build.admission_verdicts(
            wh, spark.createDataFrame([_page(301, nfd_text)],
                                      "doc_id long, html string")
        ).collect()
    }
    assert v2[301] == ("exact_dup", 300)

    # same-batch NFC/NFD twins: intra-batch exact stage keeps one
    other_nfc = BASE + " a résumé of the crème brûlée item 9400"
    other_nfd = unicodedata.normalize("NFD", other_nfc)
    v3 = {
        r.doc_id: (r.status, r.dup_of)
        for r in corpus_build.admission_verdicts(
            wh, spark.createDataFrame(
                [_page(310, other_nfc), _page(311, other_nfd)],
                "doc_id long, html string")
        ).collect()
    }
    assert v3[310][0] == "admitted"
    assert v3[311] == ("exact_dup", 310)
