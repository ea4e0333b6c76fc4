"""Streaming media admission over the PERSISTED ledger: a binary-blob
file-stream applied batch-by-batch through foreachBatch +
media_index.ingest — the media twin of test_stream_dedup_index. The
property under test is cross-micro-batch memory: a blob admitted in
batch N must reject a near-dup arriving in batch N+1, with the ledger
state carried in the warehouse (not in stream state), so a restart
resumes from the checkpoint + committed ledger."""

import os

from etl_fraud_detection_spark.functions import png, wav
from etl_fraud_detection_spark.operators import media_index
from etl_fraud_detection_spark.operators.multimodal import MEDIA_SCHEMA
from etl_fraud_detection_spark.pipeline import Warehouse

W, H = 12, 10


def _img(seed, bump=None):
    px = bytearray((x * 29 + y * 57 + seed * 83) % 256
                   for y in range(H) for x in range(W))
    if bump is not None:
        px[bump] = (px[bump] + 40) % 256
    return png.encode_png(W, H, 1, bytes(px))


def _write_stream_files(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = os.path.join(str(tmp_path), f"b{i}.dir")
        spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        os.rename(os.path.join(d, part), os.path.join(src, f"b{i}.parquet"))
    return src


def test_streaming_media_admission_remembers_earlier_batches(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_index.build(
        wh, spark.createDataFrame([], MEDIA_SCHEMA), run_id=1
    )  # empty ledger: the stream IS the corpus

    base_audio = [((i * 37) % 200 - 100) * 80 for i in range(50)]
    src = _write_stream_files(
        spark,
        tmp_path,
        [
            # batch 0: image 1 + audio 2, both admitted
            [(1, "png", W, H, _img(0)),
             (2, "wav", 0, 0, wav.encode_wav(8000, 1, base_audio))],
            # batch 1: 10 near-dups image 1; 11 is a NEW image
            [(10, "png", W, H, _img(0, bump=17)),
             (11, "png", W, H, _img(5))],
            # batch 2: 20 near-dups 11 (admitted in batch 1!);
            # 21 is a rescaled copy of audio 2
            [(20, "png", W, H, _img(5, bump=17)),
             (21, "wav", 0, 0,
              wav.encode_wav(8000, 1, [s * 2 for s in base_audio]))],
        ],
    )

    verdicts: dict[int, tuple[bool, int | None, str | None]] = {}

    def admit(batch_df, batch_id):
        adm = media_index.ingest(wh, batch_df, run_id=100 + batch_id)
        for r in adm.collect():
            verdicts[r.media_id] = (r.admitted, r.dup_of, r.via)

    q = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert verdicts == {
        1: (True, None, None),
        2: (True, None, None),
        10: (False, 1, "image"),
        11: (True, None, None),
        20: (False, 11, "image"),   # cross-batch memory via the ledger
        21: (False, 2, "audio"),
    }
    stored = {
        r.media_id
        for r in wh.read("index", media_index.T_ADMITTED).collect()
    }
    assert stored == {1, 2, 11}
