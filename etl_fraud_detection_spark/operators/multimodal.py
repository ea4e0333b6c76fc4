"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The decode step is STUBBED — PIL/ffmpeg are not in this container —
but everything Spark-side is real and tested: the schema contract,
the batch iterator shape, and the deterministic byte-level features.
``real_decode`` documents exactly where a codec plugs in.

Scale notes (100 TB of media): mapInPandas streams Arrow batches —
memory is bounded by batch size, not partition size; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large blobs.
Feature extraction is embarrassingly parallel: no shuffle at all, so
the job scales linearly with executors; co-locate by storage block via
input partitioning, never repartition blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, format string, width int, height int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, brightness double"
)


def real_decode(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Where a real image codec goes (PIL.Image.open(io.BytesIO(...)))."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; the pipeline uses declared metadata + byte features"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Per-blob features via an Arrow-batched pandas iterator: byte
    count, declared dimensions, and a deterministic stand-in for a
    decoded statistic (mean of the first 4 payload bytes / 255 — the
    place a real `brightness after decode` would compute)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "brightness": payloads.map(
                        lambda b: sum(b[:4]) / (4.0 * 255.0)
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
