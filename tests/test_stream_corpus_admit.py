"""Streaming corpus admission: an HTML page file-stream applied
batch-by-batch through foreachBatch + corpus_build.admit_corpus_batch
— the streaming twin of the daily crawl admission. Properties under
test: cross-micro-batch memory through BOTH rejection stores (a doc
admitted in batch N rejects a near-dup in batch N+1 via the grown band
ledger, and an exact copy in batch N+2 via the stored survivor
fingerprints); per-batch shard appends keep the whole export
verifiable; and every batch leaves an audit run."""

import os

import pytest

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import corpus_build, export
from etl_fraud_detection_spark.pipeline import Warehouse

SCHEMA = "doc_id long, html string"
BASE = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps in the warm sun for a while before it wakes up again"
)
TEXT_A = BASE + " a first streaming arrival about item 7000"
TEXT_B = BASE + " a second streaming arrival about item 8000"
TEXT_C = BASE + " a third streaming arrival about item 9000"
TEXT_D = BASE + " a fourth streaming arrival about item 9500"


def _page(i, text):
    return (
        i,
        f"<html><head><title>Doc {i}</title></head><body>"
        f"<h1>Doc {i}</h1><p>{text}</p></body></html>",
    )


def _corpus_text(i):
    return BASE + f" closing sentence {i} about topic {i * i} and item {i + 100}"


def _seed_corpus(spark, wh):
    rows = [_page(i, _corpus_text(i)) for i in range(1, 5)]
    pages = spark.createDataFrame(rows, SCHEMA)
    corpus_build.build_corpus(
        wh, pages, run_id=1, tau=0.8, target_tokens=64, with_ledger=True
    )


def _write_stream_files(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = os.path.join(str(tmp_path), f"b{i}.dir")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        os.rename(os.path.join(d, part), os.path.join(src, f"b{i}.parquet"))
    return src


def test_streaming_admission_grows_corpus_batch_by_batch(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed_corpus(spark, wh)
    surv0 = {r.doc_id for r in wh.read("corpus", "survivors").collect()}
    max_shard0 = wh.read("export", "training_shards").agg(
        F.max("shard_id")
    ).collect()[0][0]

    src = _write_stream_files(
        spark,
        tmp_path,
        [
            [_page(101, TEXT_A), _page(102, TEXT_B)],   # both admitted
            [
                _page(110, TEXT_A + " extra"),          # near-dups 101
                _page(111, _corpus_text(3)),            # exact copy of seed 3
            ],
            [
                _page(120, TEXT_B),                     # exact copy of 102
                _page(121, TEXT_C),                     # fresh
            ],
            [
                _page(130, TEXT_D),                     # in-batch near pair:
                _page(131, TEXT_D + " extra"),          # longer twin wins
            ],
        ],
    )

    def admit(batch_df, batch_id):
        corpus_build.admit_corpus_batch(
            wh, batch_df, run_id=100 + batch_id, tau=0.8, target_tokens=64
        )

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    v = {
        r.doc_id: (r.status, r.dup_of, r.run_id)
        for r in wh.read("corpus", "admissions").collect()
    }
    assert v[101][:2] == ("admitted", None)
    assert v[102][:2] == ("admitted", None)
    # cross-batch memory via the grown band ledger...
    assert v[110][:2] == ("near_dup", 101)
    # ...via the SEED corpus fingerprints...
    assert v[111][:2] == ("exact_dup", 3)
    # ...and via fingerprints of a doc admitted two batches earlier
    assert v[120][:2] == ("exact_dup", 102)
    assert v[121][:2] == ("admitted", None)
    # two near-dups arriving in the SAME micro-batch: exactly one
    # admits (the longer), the other points at the in-batch winner
    assert v[131][:2] == ("admitted", None)
    assert v[130][:2] == ("near_dup", 131)
    # one audit run per micro-batch
    assert {run for _s, _d, run in v.values()} == {100, 101, 102, 103}

    surv = {r.doc_id for r in wh.read("corpus", "survivors").collect()}
    assert surv == surv0 | {101, 102, 121, 131}
    # per-batch shard appends: strictly growing ids, whole export intact
    new_shards = wh.read("export", "training_shards").where(
        F.col("shard_id") > max_shard0
    )
    new_train = wh.read("corpus", "survivors").where(
        (F.col("doc_id") >= 100) & (F.col("split") == "train")
    ).count()
    assert new_shards.count() == new_train
    assert export.verify_export(
        wh, "n_bpe_tokens",
        ["doc_id", "text", "fp", "cluster_id", "n_members", "bucket",
         "split", "n_bpe_tokens"],
    ).count() == 0


def test_redelivered_micro_batch_is_idempotent(spark, tmp_path):
    """foreachBatch redelivery after a crash between the warehouse
    commit and the stream checkpoint: the SAME batch frame applied
    twice must not duplicate survivors, ledger rows, or shards."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed_corpus(spark, wh)
    batch = spark.createDataFrame(
        [_page(101, TEXT_A), _page(102, TEXT_B)], SCHEMA
    )
    corpus_build.admit_corpus_batch(
        wh, batch, run_id=100, tau=0.8, target_tokens=64
    )
    state = {
        t: sorted(tuple(r) for r in wh.read(l, t).collect())
        for l, t in (
            ("corpus", "survivors"), ("export", "training_shards"),
            ("index", "nd_bands"),
        )
    }
    res = corpus_build.admit_corpus_batch(
        wh, batch, run_id=101, tau=0.8, target_tokens=64
    )
    assert res["n_admitted"] == 0
    after = {
        t: sorted(tuple(r) for r in wh.read(l, t).collect())
        for l, t in (
            ("corpus", "survivors"), ("export", "training_shards"),
            ("index", "nd_bands"),
        )
    }
    assert after == state
    # and the redelivered docs idempotently report admitted
    replay = {
        r.doc_id: r.status
        for r in wh.read("corpus", "admissions")
        .where(F.col("run_id") == 101).collect()
    }
    assert replay == {101: "admitted", 102: "admitted"}
