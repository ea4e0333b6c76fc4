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


RESIZE_SCHEMA = (
    "media_id long, width int, height int, new_width int, new_height int, "
    "payload binary"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def resize_media(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """Resize plumbing: compute target dimensions (fit-within-max_dim,
    aspect preserved, never upscale) per blob in an Arrow batch. The
    pixel resample itself is the stubbed codec step (``real_decode``) —
    a real deployment replaces the payload passthrough with
    PIL.Image.resize; the Spark contract (schema, batching, no shuffle)
    is identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            longest = pdf[["width", "height"]].max(axis=1).clip(lower=1)
            scale = (max_dim / longest).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": (pdf["width"] * scale).astype("int32"),
                    "new_height": (pdf["height"] * scale).astype("int32"),
                    "payload": pdf["payload"],
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 4, stride: int = 2) -> DataFrame:
    """Frame sampling for video-like payloads: treat the blob as a
    concatenation of fixed-size frames and emit every ``stride``-th one
    (a real container would use keyframe offsets from the demuxer — the
    stubbed step). One input row fans out to many; still map-only, no
    shuffle: sampling happens where the blob was read."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) // frame_size
                for i in range(0, n, stride):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


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
