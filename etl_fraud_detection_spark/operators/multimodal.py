"""Multimodal column processing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

PNG payloads are decoded for real by the pure-stdlib codec in
functions/png.py — decoded width/height/brightness come from actual
pixels, and one fixture's declared metadata deliberately lies so a
metadata echo cannot pass the oracle. WAV payloads are decoded for real
by functions/wav.py (PCM16 samples -> rate/duration/amplitude
features). Formats without an in-container codec (jpg; video demux)
remain opaque: byte-level features only, decoded fields NULL — the
honest split between "decoded" and "declared".

Scale notes (100 TB of media): mapInPandas streams Arrow batches —
memory is bounded by batch size, not partition size; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large blobs.
Feature extraction and resizing are embarrassingly parallel: no
shuffle at all, so the job scales linearly with executors; co-locate
by storage block via input partitioning, never repartition blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions import jpeg, png

# every decodable-container error that routes a payload to the opaque path
_DECODE_ERRORS = (png.PngError, jpeg.JpegError)

MEDIA_SCHEMA = (
    "media_id long, format string, width int, height int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, "
    "decoded_width int, decoded_height int, brightness double"
)

RESIZE_SCHEMA = (
    "media_id long, width int, height int, new_width int, new_height int, "
    "payload binary"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def real_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a media payload to (width, height, channels, pixels):
    PNG first (functions/png.py), then baseline JPEG
    (functions/jpeg.py). Undecodable containers raise one of
    ``_DECODE_ERRORS`` and flow through the opaque-bytes path."""
    try:
        return png.decode_png(payload)
    except png.PngError:
        return jpeg.decode_jpeg(payload)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Per-blob features via an Arrow-batched pandas iterator. For
    decodable payloads (PNG): real decoded dimensions and brightness =
    sum(samples) / (n_samples * 255) over actual pixel data. For opaque
    payloads: decoded dims NULL and a deterministic byte-level
    stand-in (mean of the first 4 payload bytes / 255)."""

    def one(payload: bytes):
        try:
            w, h, ch, px = real_decode(payload)
        except _DECODE_ERRORS:
            return None, None, sum(payload[:4]) / (4.0 * 255.0)
        return w, h, sum(px) / (len(px) * 255.0)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "decoded_width": pd.array([f[0] for f in feats], dtype="Int32"),
                    "decoded_height": pd.array([f[1] for f in feats], dtype="Int32"),
                    "brightness": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """Fit-within-``max_dim`` resize (aspect preserved, never upscale).
    Target dimensions come from the *decoded* size when the payload is
    decodable — metadata is advisory only — and the payload is actually
    resampled (nearest-neighbor) and re-encoded. Opaque payloads plan
    against declared metadata and pass through unchanged."""

    def one(declared_w: int, declared_h: int, payload: bytes):
        try:
            w, h, ch, px = real_decode(payload)
        except _DECODE_ERRORS:
            w, h = max(int(declared_w), 0), max(int(declared_h), 0)
            scale = min(max_dim / max(max(w, h), 1), 1.0)
            return int(w * scale), int(h * scale), payload
        scale = min(max_dim / max(max(w, h), 1), 1.0)
        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
        if (nw, nh) == (w, h):
            return nw, nh, payload
        resized = png.resize_nearest(w, h, ch, px, nw, nh)
        # thumbnails re-encode as PNG regardless of source container:
        # lossless, so downstream verification stays bit-exact
        return nw, nh, png.encode_png(nw, nh, ch, resized)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [
                one(w, h, p)
                for w, h, p in zip(pdf["width"], pdf["height"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": pd.array([r[0] for r in res], dtype="Int32"),
                    "new_height": pd.array([r[1] for r in res], dtype="Int32"),
                    "payload": [r[2] for r in res],
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_channels int, "
    "n_frames long, duration_s double, peak_abs long, mean_abs double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio features from REAL decoded PCM samples (functions/wav.py):
    sample rate / channels / frame count from the container, duration
    and mean absolute amplitude as single exact-integer divisions (so
    an external oracle matches bitwise). Non-WAV payloads get NULL
    audio columns — same honest opaque split as the image path. Same
    scale shape as the other extractors: Arrow-batched mapInPandas,
    no shuffle."""
    from ..functions import wav

    def one(payload: bytes):
        try:
            rate, ch, samples = wav.decode_wav(payload)
        except wav.WavError:
            return (None,) * 6
        n = len(samples)
        if n == 0:
            return rate, ch, 0, 0.0, 0, 0.0
        sum_abs = sum(abs(s) for s in samples)
        return (
            rate, ch, n // ch, (n // ch) / rate, max(abs(s) for s in samples),
            sum_abs / n,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sample_rate": pd.array([f[0] for f in feats], dtype="Int32"),
                    "n_channels": pd.array([f[1] for f in feats], dtype="Int32"),
                    "n_frames": pd.array([f[2] for f in feats], dtype="Int64"),
                    "duration_s": [f[3] for f in feats],
                    "peak_abs": pd.array([f[4] for f in feats], dtype="Int64"),
                    "mean_abs": [f[5] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


MJPEG_FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_width int, frame_height int, "
    "frame_brightness double"
)


def extract_mjpeg_frames(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL video-frame extraction for MJPEG payloads (a video stream of
    concatenated baseline JPEGs — the classic IP-camera/AVI-MJPG
    format): split the blob on SOI..EOI marker boundaries, decode every
    ``stride``-th frame with the pure-stdlib JPEG codec, and emit
    decoded dimensions + pixel-mean brightness per frame.

    Map-only fan-out like the byte-level sampler, but the frames are
    actual decoded rasters, not byte windows. Undecodable segments and
    non-MJPEG payloads yield no rows (the honest opaque split)."""

    def frames_of(payload: bytes):
        idx = 0
        start = payload.find(b"\xff\xd8")
        out = []
        while start != -1:
            end = payload.find(b"\xff\xd9", start + 2)
            if end == -1:
                break
            seg = payload[start : end + 2]
            if idx % stride == 0:
                try:
                    w, h, ch, px = jpeg.decode_jpeg(seg)
                    out.append((idx, w, h, sum(px) / (len(px) * 255.0)))
                except jpeg.JpegError:
                    pass
            idx += 1
            start = payload.find(b"\xff\xd8", end + 2)
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ws, hs, brs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, w, h, br in frames_of(bytes(payload)):
                    ids.append(mid)
                    idxs.append(idx)
                    ws.append(w)
                    hs.append(h)
                    brs.append(br)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_width": ws,
                    "frame_height": hs,
                    "frame_brightness": brs,
                }
            )

    return media.mapInPandas(batches, schema=MJPEG_FRAME_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 4, stride: int = 2) -> DataFrame:
    """Frame sampling for video-like payloads: treat the blob as a
    concatenation of fixed-size frames and emit every ``stride``-th one
    (a real container would use keyframe offsets from the demuxer —
    video demux stays out of scope in this container). One input row
    fans out to many; still map-only, no shuffle: sampling happens
    where the blob was read."""

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


AHASH_SCHEMA = "media_id long, ahash long"


def ahash_64(w: int, h: int, ch: int, px: bytes) -> int:
    """64-bit average-hash of a decoded raster: sample an 8x8 grid with
    the same floor-index nearest-neighbor mapping as resize_media, gray
    = integer channel sum (no float), bit i set iff 64*gray_i > total
    (strict integer compare — no mean rounding to diverge on). Images
    that differ only by scale hash identically when the sample grids
    align; near-duplicate crops/edits differ in a few bits, so Hamming
    distance over these hashes is the image near-dup signal. Returned
    as a SIGNED 64-bit value (bit 63 wraps) for Arrow/parquet
    friendliness."""
    grays = []
    for gy in range(8):
        sy = (gy * h) // 8
        for gx in range(8):
            sx = (gx * w) // 8
            base = (sy * w + sx) * ch
            grays.append(sum(px[base:base + ch]))
    total = sum(grays)
    bits = 0
    for i, g in enumerate(grays):
        if 64 * g > total:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Per-blob average-hash via the real decode path (PNG/baseline
    JPEG); undecodable payloads stay honestly NULL. Map-only Arrow
    batches — the dedup step downstream is a groupBy on the hash (or a
    Hamming-bucket join), never pairwise pixels."""

    def one(payload: bytes):
        try:
            w, h, ch, px = real_decode(payload)
        except _DECODE_ERRORS:
            return None
        return ahash_64(w, h, ch, px)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pd.array(
                        [one(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=AHASH_SCHEMA)


def hamming_near_dup_pairs(
    hashes: DataFrame,
    max_dist: int = 3,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "ahash",
    hash_bits: int = 64,
    collapse_exact: bool = True,
) -> DataFrame:
    """Image near-dup PAIRS over 64-bit perceptual hashes: banded
    Hamming LSH. The hash splits into ``bands`` equal bit-slices; two
    images become candidates by agreeing EXACTLY on any slice, then
    verify with the true popcount distance. Pigeonhole guarantees FULL
    recall for distance <= bands-1 (``max_dist`` must respect that),
    so unlike MinHash banding this is exact, not probabilistic.

    Scale shape (the same as every banding operator here): candidates
    meet via an equi-join on (band_idx, band_value) — per-band buckets
    co-locate, AQE splits skewed ones — and the verify is a pure
    bitwise expression on the pair, no pixel ever touched again. Band
    values are masked after the shift so arithmetic-vs-logical shift
    semantics of the sign bit can't diverge between engines.

    ``collapse_exact`` (default on) first collapses hash-identical
    media to one representative per hash value and expands member
    pairs afterwards — the media twin of
    dedup._pairs_over_exact_text_groups. Exact duplication is the
    dominant mode of a crawled media corpus, and without the collapse
    every band bucket carries (copies per item)² candidate work (the
    25x embedding probe measured 150x wall from exactly this shape).
    The emitted pair set is provably unchanged: equal hashes agree on
    every band and have distance 0, so all within-group pairs survive
    the verify in both plans, and cross-group pairs inherit the
    representative distance bit-exactly.

    Cites reference behavior: none — extension beyond the reference,
    the pair-producing step the perceptual_hash docstring promises."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    if max_dist > bands - 1:
        raise ValueError(
            f"banded Hamming guarantees recall only for dist <= bands-1 "
            f"({bands - 1}); max_dist={max_dist} would silently lose pairs"
        )
    hs = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("mid"), F.col(hash_col).alias("h")
    )
    if collapse_exact:
        from .dedup import _PERSISTED_SHINGLES

        # checkpoint the (mid, h) rows — 16 bytes/blob — so the decode
        # mapInPandas `hashes` usually sits on runs ONCE; then mark
        # group representatives via a min-AGGREGATE + join instead of
        # a min-over-window: a mass-duplicated blob (one logo 10^6x) is
        # ONE hot hash the aggregate collapses map-side and AQE
        # skew-join splits, where the window piles every copy onto one
        # reducer (round-10 skew hardening).
        hs = hs.localCheckpoint()
        firsts = hs.groupBy("h").agg(F.min("mid").alias("gid"))
        mem = hs.join(firsts, "h").persist()
        _PERSISTED_SHINGLES.append(mem)
        reps = mem.where(F.col("mid") == F.col("gid")).select(
            F.col("gid").alias(id_col), F.col("h").alias(hash_col)
        )
        raw = lambda df: hamming_near_dup_pairs(  # noqa: E731
            df, max_dist=max_dist, bands=bands, id_col=id_col,
            hash_col=hash_col, hash_bits=hash_bits, collapse_exact=False,
        )
        # adaptive short-circuit: a dup-free corpus has only singleton
        # groups — representative pairs ARE the answer
        if mem.where(F.col("mid") != F.col("gid")).limit(1).count() == 0:
            return raw(reps)
        rep_pairs = (
            raw(reps).withColumnRenamed("a", "ga").withColumnRenamed("b", "gb")
        )
        ma = mem.select(F.col("gid").alias("ga"), F.col("mid").alias("ia"))
        mb = mem.select(F.col("gid").alias("gb"), F.col("mid").alias("ib"))
        cross = rep_pairs.join(ma, ["ga"]).join(mb, ["gb"]).select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "dist",
        )
        within = (
            mem.select("gid", F.col("mid").alias("a"))
            .join(mem.select("gid", F.col("mid").alias("b")), ["gid"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b", F.lit(0).cast("int").alias("dist"))
        )
        return cross.unionByName(within)
    banded = hash_bands(hs, "mid", "h", bands, hash_bits)
    a = banded.select(
        F.col("mid").alias("a"), F.col("h").alias("ha"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col("mid").alias("b"), F.col("h").alias("hb"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("dist"))
        .distinct()  # a pair agreeing in k bands appears k times
        .where(F.col("dist") <= max_dist)
    )


def hash_bands(
    hs: DataFrame,
    id_col: str,
    hash_col: str,
    bands: int,
    hash_bits: int,
) -> DataFrame:
    """Explode a hash column into its banded bit-slices: input columns
    + (band_idx, band_val), ``bands`` rows per input row. Band values
    are masked AFTER the shift so arithmetic-vs-logical shift
    semantics of the sign bit can't diverge between engines. Shared
    by the in-plan pair join and the persisted media ledger
    (operators/media_index.py) so both produce identical band keys."""
    from pyspark.sql import functions as F

    width = hash_bits // bands
    mask = (1 << width) - 1
    return hs.select(
        *hs.columns,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col(hash_col), b * width)
                    .bitwiseAND(mask)
                    .alias("band_val"),
                )
                for b in range(bands)
            ])
        ).alias("_bd"),
    ).select(*hs.columns, "_bd.band_idx", "_bd.band_val")


EHASH_SCHEMA = "media_id long, ehash long"


def ehash_16(samples: list[int] | bytes, segments: int = 16) -> int:
    """16-bit energy-envelope hash of decoded PCM: split the sample
    sequence into ``segments`` equal index ranges, bit i set iff
    segments * segment_abs_sum_i > total_abs_sum (the strict integer
    compare of ahash_64 — no float, no rounding to diverge on).
    Amplitude-scale-INVARIANT by construction (scaling every sample by
    k scales each segment sum and the total equally), so re-normalized
    copies of a recording hash identically and small edits flip only
    the bits of the segments they touch — Hamming distance over these
    is the audio near-dup signal, exactly the image ahash contract."""
    absv = [abs(int(s)) for s in samples]
    n = len(absv)
    if n == 0:
        return 0
    total = sum(absv)
    bits = 0
    for i in range(segments):
        lo, hi = (i * n) // segments, ((i + 1) * n) // segments
        if segments * sum(absv[lo:hi]) > total:
            bits |= 1 << i
    return bits


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Per-blob energy-envelope hash via the real WAV decode path;
    non-audio / undecodable payloads stay honestly NULL. Map-only
    Arrow batches; the near-dup step downstream is
    :func:`hamming_near_dup_pairs` with hash_bits=16."""
    from ..functions import wav as wavmod

    def one(payload: bytes):
        try:
            _rate, _ch, samples = wavmod.decode_wav(payload)
        except Exception:
            return None
        return ehash_16(samples)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ehash": pd.array(
                        [one(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=EHASH_SCHEMA)


FRAME_HASH_SCHEMA = "media_id long, frame_idx int, ahash long"


def video_frame_hashes(media: DataFrame, stride: int = 1) -> DataFrame:
    """Per-frame perceptual hashes of MJPEG payloads: the SOI/EOI split
    of extract_mjpeg_frames, but each decoded frame is ahash_64-ed
    instead of summarized — the fingerprint table video dedup joins on.
    Undecodable segments and non-MJPEG payloads yield no rows."""

    def frames_of(payload: bytes):
        idx = 0
        start = payload.find(b"\xff\xd8")
        out = []
        while start != -1:
            end = payload.find(b"\xff\xd9", start + 2)
            if end == -1:
                break
            seg = payload[start : end + 2]
            if idx % stride == 0:
                try:
                    w, h, ch, px = jpeg.decode_jpeg(seg)
                    out.append((idx, ahash_64(w, h, ch, px)))
                except jpeg.JpegError:
                    pass
            idx += 1
            start = payload.find(b"\xff\xd8", end + 2)
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, hv in frames_of(bytes(payload)):
                    ids.append(mid)
                    idxs.append(idx)
                    hs.append(hv)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ahash": pd.array(hs, dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, schema=FRAME_HASH_SCHEMA)


def media_near_dup_edges(
    media: DataFrame,
    max_dist_image: int = 3,
    max_dist_audio: int = 3,
    min_shared_frames: int = 1,
) -> DataFrame:
    """Union of the three modality pair families as one (a, b) edge
    frame: image banded-Hamming pairs over perceptual hashes, audio
    banded-Hamming pairs over energy-envelope hashes, video pairs by
    shared frame content. Modalities can't cross-pair beyond what the
    underlying hashes allow, so the union is just the corpus-wide
    near-dup graph — the edge input for media survivor selection."""
    img = hamming_near_dup_pairs(
        perceptual_hash(media), max_dist=max_dist_image
    ).select("a", "b")
    aud = hamming_near_dup_pairs(
        audio_fingerprint(media),
        max_dist=max_dist_audio, bands=4, hash_col="ehash", hash_bits=16,
    ).select("a", "b")
    vid = (
        video_near_dup_pairs(video_frame_hashes(media))
        .where(F.col("n_shared_frames") >= min_shared_frames)
        .select("a", "b")
    )
    return img.unionByName(aud).unionByName(vid)


def media_cluster_survivors(
    media: DataFrame,
    max_dist_image: int = 3,
    max_dist_audio: int = 3,
    min_shared_frames: int = 1,
) -> DataFrame:
    """Pick the kept copy of every media near-dup cluster — the stage
    that turns the three pair families into a deduplicated media
    corpus, through the SAME connected-components + survivor machinery
    as text (dedup.components_from_edges / survivors_from_labels).
    Survivor policy: largest payload (most content), smallest id on
    ties; singletons (including undecodable payloads, which never
    pair) survive as their own cluster. Returns
    (cluster_id, kept_id, kept_n_bytes, n_members).

    Scale shape: the pair families are band-bucket equi-joins (never
    all-pairs), label propagation is O(log diameter) rounds, and the
    survivor pick is one window exchange over the label frame."""
    from . import dedup

    mark = len(dedup._PERSISTED_SHINGLES)
    edges = media_near_dup_edges(
        media, max_dist_image, max_dist_audio, min_shared_frames
    )
    labels = dedup.components_from_edges(
        edges, media.select("media_id"), "media_id", release_since=mark
    )
    sized = media.select(
        "media_id", F.octet_length("payload").cast("long").alias("n_bytes")
    )
    return dedup.survivors_from_labels(labels, sized, "media_id", "n_bytes")


def video_near_dup_pairs(frame_hashes: DataFrame) -> DataFrame:
    """Video near-dup PAIRS by shared frame content: two videos pair
    when they contain frames with IDENTICAL perceptual hashes, scored
    by the count of distinct shared hashes — the C4-paragraph-dedup
    shape applied to video (segment fingerprints, corpus-wide join,
    containment score). One equi-join on the 64-bit hash (buckets
    co-locate at scale; a hash shared by k videos fans out k², which
    is the true answer size) + one pair aggregate."""
    from pyspark.sql import functions as F

    a = frame_hashes.select(F.col("media_id").alias("a"), "ahash")
    b = frame_hashes.select(F.col("media_id").alias("b"), "ahash")
    return (
        a.join(b, ["ahash"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count_distinct("ahash").alias("n_shared_frames"))
    )
