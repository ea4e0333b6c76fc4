"""Streaming document admission over the PERSISTED inverted index: a
document file-stream applied batch-by-batch through foreachBatch +
text_index.ingest — the streaming twin of daily corpus admission, and
the lexical sibling of test_stream_ann_index. Properties: cross-batch
growth (a doc admitted in batch N scores in later probes), exact-
integer stats merging (the streamed index equals a single-pass build
byte-for-byte), and redelivery idempotence carried by the warehouse
ledger, not stream state."""

import os

from etl_fraud_detection_spark.operators import corpus, text_index
from etl_fraud_detection_spark.pipeline import Warehouse

SCHEMA = "doc_id long, text string"
TERMS = ["spark", "table", "window"]

DOCS = {
    1: "spark runs a distributed table scan over the window frame",
    2: "the table has a window and a door and a table again",
    3: "nothing relevant here at all just filler words to read",
    4: "spark spark spark table",
    5: "window window table spark engine plans the query",
    6: "a trailing document that mentions spark once among many words",
}


def _write_stream_files(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, ids in enumerate(batches):
        d = os.path.join(str(tmp_path), f"b{i}.dir")
        spark.createDataFrame(
            [(j, DOCS[j]) for j in ids], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        os.rename(os.path.join(d, part), os.path.join(src, f"b{i}.parquet"))
    return src


def test_streaming_doc_admission(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    all_docs = spark.createDataFrame(list(DOCS.items()), SCHEMA)
    text_index.build(wh, all_docs.where("doc_id <= 2"), run_id=1)

    # batch 2 redelivers doc 4 (already admitted in batch 0)
    src = _write_stream_files(spark, tmp_path, [[3, 4], [5], [4, 6]])

    def admit(batch_df, batch_id):
        text_index.ingest(wh, batch_df, run_id=100 + batch_id)

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

    # redelivered doc 4 admitted exactly once
    assert wh.read("index", "doc_lens").count() == len(DOCS)
    # the streamed index equals a single-pass build — scores AND stats
    whf = Warehouse(spark, str(tmp_path / "full"))
    text_index.build(whf, all_docs, run_id=1)

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    assert key(text_index.query(wh, TERMS)) == key(
        text_index.query(whf, TERMS)
    )
    assert key(wh.read("index", "term_stats")) == key(
        whf.read("index", "term_stats")
    )
    assert key(wh.read("index", "corpus_stats")) == key(
        whf.read("index", "corpus_stats")
    )
    # in-plan scorer agreement (the oracle-pairing contract)
    assert key(text_index.query(wh, TERMS)) == key(
        corpus.bm25_scores(all_docs, TERMS)
    )
