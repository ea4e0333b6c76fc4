"""Streaming corpus admission over the PERSISTED band index: a document
file-stream applied batch-by-batch through foreachBatch +
dedup_index.ingest — the streaming twin of the daily batch admission.
The property under test is cross-micro-batch memory: a doc admitted in
batch N must reject a near-dup arriving in batch N+1, with the index
state carried in the warehouse (not in stream state), so a restart
resumes from the checkpoint + committed index."""

import os

from etl_fraud_detection_spark.operators import dedup_index
from etl_fraud_detection_spark.pipeline import Warehouse

SCHEMA = "doc_id long, text string"
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"
THIRD = "red orange yellow green blue indigo violet cyan magenta white"


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


def test_streaming_admission_remembers_earlier_batches(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dedup_index.build(
        wh, spark.createDataFrame([], SCHEMA), run_id=1
    )  # empty index: the stream IS the corpus

    src = _write_stream_files(
        spark,
        tmp_path,
        [
            [(1, BASE), (2, OTHER)],     # batch 0: both admitted
            [(10, BASE), (11, THIRD)],   # batch 1: 10 dups 1; 11 new
            [(20, THIRD)],               # batch 2: dups 11 (admitted in batch 1!)
        ],
    )

    verdicts: dict[int, tuple[bool, int | None]] = {}

    def admit(batch_df, batch_id):
        adm = dedup_index.ingest(wh, batch_df, run_id=100 + batch_id)
        for r in adm.collect():
            verdicts[r.doc_id] = (r.admitted, r.dup_of)

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

    assert verdicts == {
        1: (True, None),
        2: (True, None),
        10: (False, 1),
        11: (True, None),
        20: (False, 11),  # cross-batch memory via the persisted index
    }
    stored = {
        r.doc_id
        for r in wh.read("index", "nd_bands").select("doc_id").distinct().collect()
    }
    assert stored == {1, 2, 11}
