"""Streaming -> warehouse bridge with exactly-once semantics.

Structured Streaming's file/offset tracking gives at-least-once delivery
into ``foreachBatch``; exactly-once lands by making the batch write
IDEMPOTENT: every micro-batch writes its rows under a ``_batch_id``
partition with dynamic partition overwrite, so a replayed batch (crash
between data write and checkpoint commit) simply overwrites its own
partition instead of appending duplicates. This is the standard
exactly-once recipe for non-transactional sinks and it holds on a
1000-executor cluster: the overwrite is scoped to one partition
directory, never the table.

The checkpoint directory carries the source offsets — restarting the
same query resumes after the last committed batch, so a bounded replay
split across several runs converges to exactly the batch result
(tests/test_stream_sink.py kills and resumes a replay to prove it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def idempotent_batch_writer(path: str):
    """A ``foreachBatch`` function writing each micro-batch under its
    own ``_batch_id=`` partition with dynamic partition overwrite —
    replaying a batch is a no-op-equivalent overwrite, not a duplicate
    append."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write


def run_events_to_warehouse(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    schema: str,
) -> None:
    """Drain whatever files are currently visible in ``source_dir`` into
    ``target_path`` exactly once (AvailableNow + checkpointed offsets +
    idempotent batch writes). Safe to call repeatedly — each call picks
    up only files not yet committed to the checkpoint."""
    from ..session import tune

    tune(spark)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(target_path))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
