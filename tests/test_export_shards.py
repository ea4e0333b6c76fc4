"""Sized-shard training export (operators/export.py): deterministic
shard assignment, atomic commit, exactly-once re-run."""

import os

import pytest

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import export
from etl_fraud_detection_spark.pipeline import Warehouse

TARGET = 4096


def _docs(spark, n=200, extra=0):
    rows = [(i, "x" * (50 + (i * 37) % 500)) for i in range(n + extra)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("n_bytes", F.length("text").cast("long"))


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "expwh"))


def test_export_round_trip(spark, wh):
    docs = _docs(spark)
    res = export.export_shards(
        wh, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    assert not res["skipped"]
    rows = wh.read("export", "training_shards").collect()

    # nothing lost, nothing duplicated
    assert sorted(r.doc_id for r in rows) == list(range(200))
    # shuffle_pos is a complete 1..N permutation a loader can seek into
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, 201))
    # shard assignment is the pure function of (start_offset, target)
    assert all(r.shard_id == r.start_offset // TARGET for r in rows)
    # shard_id monotone in shuffle_pos: shards stream sequentially
    in_order = sorted(rows, key=lambda r: r.shuffle_pos)
    assert all(
        a.shard_id <= b.shard_id for a, b in zip(in_order, in_order[1:])
    )
    # every shard is within one document of the target size
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    max_doc = max(r.n_bytes for r in rows)
    last = max(by_shard)
    for sid, members in by_shard.items():
        size = sum(r.n_bytes for r in members)
        assert size <= TARGET + max_doc
        if sid != last:
            assert size >= TARGET - max_doc
    assert res["n_shards"] == len(by_shard)
    assert res["total_bytes"] == sum(r.n_bytes for r in rows)

    # one data file per shard directory
    p = wh.path("export", "training_shards")
    vdir = wh._vdir(p, wh._current(p))
    for d in os.listdir(vdir):
        if d.startswith("shard_id="):
            parts = [
                f for f in os.listdir(os.path.join(vdir, d))
                if f.endswith(".parquet")
            ]
            assert len(parts) == 1, (d, parts)


def test_rerun_is_exactly_once(spark, wh):
    docs = _docs(spark)
    export.export_shards(wh, docs, run_id=1, size_col="n_bytes",
                         target_bytes=TARGET)
    p = wh.path("export", "training_shards")
    v1, commits1 = wh._current(p), wh.commits()

    res = export.export_shards(wh, docs, run_id=2, size_col="n_bytes",
                               target_bytes=TARGET)
    assert res["skipped"]
    assert wh._current(p) == v1  # no new version written
    assert wh.commits() == commits1  # no new commit made

    # changed input re-exports; the new doc lands in the shard table
    res2 = export.export_shards(wh, _docs(spark, extra=1), run_id=3,
                                size_col="n_bytes", target_bytes=TARGET)
    assert not res2["skipped"]
    assert wh._current(p) > v1
    assert res2["n_rows"] == 201
    # a different target is a different export spec, not a token match
    res3 = export.export_shards(wh, _docs(spark, extra=1), run_id=4,
                                size_col="n_bytes", target_bytes=TARGET * 2)
    assert not res3["skipped"]


def test_content_edit_same_shape_invalidates_token(spark, wh):
    """A text revision that preserves doc_ids AND the size column must
    re-export — the token carries row content, not just (count, bytes,
    keys), so same-shape edits can never serve stale shards."""
    docs = _docs(spark)
    export.export_shards(wh, docs, run_id=1, size_col="n_bytes",
                         target_bytes=TARGET)
    # flip one doc's text to a same-length different string: count,
    # byte sum, and every md5(doc_id) are all unchanged
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7,
               F.concat(F.lit("y"), F.expr("substring(text, 2)")))
        .otherwise(F.col("text")),
    )
    res = export.export_shards(wh, edited, run_id=2, size_col="n_bytes",
                               target_bytes=TARGET)
    assert not res["skipped"]
    # and the re-exported shard table actually carries the new text
    got = wh.read("export", "training_shards").where(
        F.col("doc_id") == 7
    ).collect()[0]["text"]
    assert got.startswith("y")


def test_null_position_changes_row_digest(spark, wh):
    """Rows differing only in WHICH nullable column holds the value
    must digest differently (explicit NULL markers) — otherwise a
    tampered shard with shifted columns passes verify_export."""
    a = spark.createDataFrame([(1, None, "x")], "k long, u string, v string")
    b = spark.createDataFrame([(1, "x", None)], "k long, u string, v string")
    cols = ["k", "u", "v"]
    da = a.select(export._row_digest(cols).alias("d")).collect()[0]["d"]
    db = b.select(export._row_digest(cols).alias("d")).collect()[0]["d"]
    assert da != db


def test_verify_before_any_export_raises_clearly(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "emptywh"))
    with pytest.raises(ValueError, match="no committed export"):
        export.verify_export(wh, "n_bytes", ["doc_id"])


def test_assignment_deterministic_across_warehouses(spark, wh, tmp_path):
    docs = _docs(spark)
    export.export_shards(wh, docs, run_id=1, size_col="n_bytes",
                         target_bytes=TARGET)
    wh2 = Warehouse(spark, str(tmp_path / "expwh2"))
    export.export_shards(wh2, docs, run_id=1, size_col="n_bytes",
                         target_bytes=TARGET)
    a = sorted(
        (r.doc_id, r.shuffle_pos, r.shard_id)
        for r in wh.read("export", "training_shards").collect()
    )
    b = sorted(
        (r.doc_id, r.shuffle_pos, r.shard_id)
        for r in wh2.read("export", "training_shards").collect()
    )
    assert a == b


def test_crash_mid_export_rolls_back_whole_export(spark, wh, monkeypatch):
    """Dying between the shard write and the manifest write must leave
    the PREVIOUS complete export (shards + matching manifest), never a
    new shard set with a stale manifest."""
    docs = _docs(spark)
    export.export_shards(wh, docs, run_id=1, size_col="n_bytes",
                         target_bytes=TARGET)
    before = sorted(
        (r.doc_id, r.shard_id)
        for r in wh.read("export", "training_shards").collect()
    )

    real_overwrite = Warehouse.overwrite

    def crashing(self, layer, table, df, partition_by=None):
        if table == export.T_MANIFEST:
            raise RuntimeError("chaos: died before manifest swap")
        return real_overwrite(self, layer, table, df, partition_by)

    monkeypatch.setattr(Warehouse, "overwrite", crashing)
    with pytest.raises(RuntimeError, match="chaos"):
        export.export_shards(wh, _docs(spark, extra=5), run_id=2,
                             size_col="n_bytes", target_bytes=TARGET)
    monkeypatch.setattr(Warehouse, "overwrite", real_overwrite)

    wh2 = Warehouse(spark, wh.root)  # fresh process
    assert wh2.recover() == 2
    after = sorted(
        (r.doc_id, r.shard_id)
        for r in wh2.read("export", "training_shards").collect()
    )
    assert after == before
    # and the re-run completes the interrupted export
    res = export.export_shards(wh2, _docs(spark, extra=5), run_id=3,
                               size_col="n_bytes", target_bytes=TARGET)
    assert not res["skipped"] and res["n_rows"] == 205


def test_checksums_verify_clean_and_detect_tamper(spark, wh):
    docs = _docs(spark)
    export.export_shards(
        wh, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    cols = ["doc_id", "text", "n_bytes"]
    # committed alongside the shards, and the recompute agrees
    stored = wh.read("export", "shard_checksums")
    n_shards = wh.read("export", "training_shards").select(
        "shard_id"
    ).distinct().count()
    assert stored.count() == n_shards
    assert export.verify_export(wh, "n_bytes", cols).count() == 0

    # tamper: swap one shard's stored digest
    rows = stored.collect()
    bad = [
        (r["shard_id"],
         r["n_docs"],
         r["shard_bytes"],
         "0" * 32 if r["shard_id"] == rows[0]["shard_id"] else r["content_md5"])
        for r in rows
    ]
    tampered = spark.createDataFrame(
        bad, "shard_id long, n_docs long, shard_bytes long, content_md5 string"
    )
    wh.begin_run(9)
    wh.overwrite("export", "shard_checksums", tampered)
    wh.commit_run(9)
    mism = export.verify_export(wh, "n_bytes", cols).collect()
    assert [r["shard_id"] for r in mism] == [rows[0]["shard_id"]]


def test_rerun_keeps_checksums(spark, wh):
    docs = _docs(spark)
    export.export_shards(
        wh, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    before = sorted(
        tuple(r) for r in wh.read("export", "shard_checksums").collect()
    )
    res = export.export_shards(
        wh, docs, run_id=2, size_col="n_bytes", target_bytes=TARGET
    )
    assert res["skipped"]
    assert sorted(
        tuple(r) for r in wh.read("export", "shard_checksums").collect()
    ) == before


# -- resumable (chunked) export ------------------------------------------


def _snapshot(wh):
    shards = sorted(
        tuple(r)
        for r in wh.read("export", "training_shards")
        .select("doc_id", "shuffle_pos", "start_offset", "shard_id")
        .collect()
    )
    sums = sorted(tuple(r) for r in wh.read("export", "shard_checksums").collect())
    man = tuple(wh.read("export", "export_manifest").collect()[0])
    return shards, sums, man


def test_resumable_matches_single_commit(spark, wh, tmp_path):
    docs = _docs(spark)
    res = export.export_shards(
        wh, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET,
        checkpoint_every=4,
    )
    assert not res["skipped"] and res["resumed_shards"] == 0
    wh2 = Warehouse(spark, str(tmp_path / "singlewh"))
    export.export_shards(
        wh2, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    assert _snapshot(wh) == _snapshot(wh2)
    # the publish is a hardlink swap, not a data rewrite: every served
    # parquet file shares an inode with its staged twin
    sp = wh.path("export", "staging_shards")
    pp = wh.path("export", "training_shards")
    staged_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(wh._vdir(sp, wh._current(sp)))
        for f in fs if f.endswith(".parquet")
    }
    for r, _d, fs in os.walk(wh._vdir(pp, wh._current(pp))):
        for f in fs:
            if f.endswith(".parquet"):
                assert os.stat(os.path.join(r, f)).st_ino in staged_inodes


def test_crash_resume_writes_only_missing_shards(spark, wh, tmp_path):
    docs = _docs(spark)
    with pytest.raises(RuntimeError, match="injected crash"):
        export.export_shards(
            wh, docs, run_id=10, size_col="n_bytes", target_bytes=TARGET,
            checkpoint_every=3, _fail_before_commit_chunk=2,
        )
    # readers never saw a partial export: the served table doesn't exist
    assert wh.read("export", "training_shards") is None
    wh.recover()
    # chunk 1 committed durably; the crashed chunk 2 rolled back
    done = wh.read("export", "staging_progress").collect()
    assert len(done) == 3
    res = export.export_shards(
        wh, docs, run_id=20, size_col="n_bytes", target_bytes=TARGET,
        checkpoint_every=3,
    )
    assert res["resumed_shards"] == 3
    # final state byte-identical to an uninterrupted single-commit run
    wh2 = Warehouse(spark, str(tmp_path / "uninterrupted"))
    export.export_shards(
        wh2, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    assert _snapshot(wh) == _snapshot(wh2)
    assert export.verify_export(wh, "n_bytes", docs.columns).count() == 0


def test_crash_resume_without_manual_recover(spark, wh, tmp_path):
    """The advertised recovery path is a PLAIN re-run: export_shards
    itself must roll the crashed run back before trusting the staging
    ledger — without it, shards staged by the crashed (uncommitted)
    chunk are visible-but-unrecorded and a resume re-appends them,
    publishing duplicated rows with self-consistent checksums that
    verify_export cannot catch."""
    docs = _docs(spark)
    with pytest.raises(RuntimeError, match="injected crash"):
        export.export_shards(
            wh, docs, run_id=10, size_col="n_bytes", target_bytes=TARGET,
            checkpoint_every=3, _fail_before_commit_chunk=2,
        )
    # NO manual wh.recover() here — the resume must do it itself
    res = export.export_shards(
        wh, docs, run_id=20, size_col="n_bytes", target_bytes=TARGET,
        checkpoint_every=3,
    )
    assert res["resumed_shards"] == 3 and res["n_rows"] == 200
    # no duplicated rows made it into the published table
    rows = wh.read("export", "training_shards").collect()
    assert sorted(r.doc_id for r in rows) == list(range(200))
    assert export.verify_export(wh, "n_bytes", docs.columns).count() == 0
    # byte-identical to an uninterrupted run
    wh2 = Warehouse(spark, str(tmp_path / "cleanrun"))
    export.export_shards(
        wh2, docs, run_id=1, size_col="n_bytes", target_bytes=TARGET
    )
    assert _snapshot(wh) == _snapshot(wh2)


def test_stale_staging_from_changed_corpus_is_discarded(spark, wh):
    docs_a = _docs(spark)
    with pytest.raises(RuntimeError, match="injected crash"):
        export.export_shards(
            wh, docs_a, run_id=10, size_col="n_bytes", target_bytes=TARGET,
            checkpoint_every=3, _fail_before_commit_chunk=2,
        )
    wh.recover()
    # corpus changed between crash and resume: same ids/sizes, new text
    docs_b = docs_a.withColumn(
        "text", F.concat(F.lit("B"), F.expr("substring(text, 2)"))
    )
    res = export.export_shards(
        wh, docs_b, run_id=20, size_col="n_bytes", target_bytes=TARGET,
        checkpoint_every=3,
    )
    # nothing from the stale attempt was trusted
    assert res["resumed_shards"] == 0 and not res["skipped"]
    assert export.verify_export(wh, "n_bytes", docs_b.columns).count() == 0
    texts = {
        r["text"][:1]
        for r in wh.read("export", "training_shards").select("text").collect()
    }
    assert texts == {"B"}
