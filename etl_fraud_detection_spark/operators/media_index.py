"""Persisted media near-dup ledger: incremental image/audio/video
admission whose daily cost scales with the BATCH, not the corpus.

The three in-plan media pair families (operators/multimodal.py —
banded Hamming over image aHashes, banded Hamming over audio
energy-envelope hashes, shared-frame containment over video frame
hashes) answer "which pairs exist in THIS table". A daily crawl needs
the other question — "is this new blob a near-dup of anything ever
admitted" — without re-decoding or re-pairing the corpus. This is the
media member of the stored-index family (text: dedup_index; vectors:
ann_index; lexical: text_index), holding four compact tables derived
from every admitted blob (never the pixels/samples themselves):

- ``md_hashes``  (media_id, modality, h): the 64-bit image aHash /
  16-bit audio eHash per decodable blob — the verify side of the
  banded probe (popcount distance needs the full hash).
- ``md_bands``   (media_id, modality, band_idx, band_val): the banded
  bit-slices (multimodal.hash_bands — the SAME band keys as the
  in-plan join), the LSH acceleration structure the batch probes.
  At scale this table is written bucketed by (band_idx, band_val) so
  the probe co-locates.
- ``md_frames``  (media_id, ahash): distinct perceptual hashes of
  every admitted video's frames; the batch's frame hashes equi-join
  here (the C4-paragraph-dedup shape applied to video).
- ``md_admitted`` (media_id): the admission ledger — replayed ids are
  anti-joined out, making ingest exactly-once per media id EVEN for
  blobs that decode to nothing (corrupt payloads leave no hash rows,
  so only this table can guard their replay).

All four ride the warehouse's multi-table atomic commit
(begin_run/commit_run): a crash mid-ingest rolls the whole admission
back together — the ledger can never hold a blob's bands without its
hashes. This is the watermark-incremental discipline of the
reference's extract loop (/root/reference/etl.py:190-199: "process
only what's new, against persisted state") applied to media.

Scale shape (100 TB of media, daily batches): the batch side of every
probe is broadcastable; the ledger side is scanned once per ingest
(pre-bucketed at scale so only colliding buckets move); decode cost
is strictly O(batch blobs) via the Arrow mapInPandas extractors.
INTRA-BATCH near dups are handled too (a daily crawl is full of
same-template twins arriving together): after the ledger probe, the
ledger-admitted blobs cluster over their own signature edges — the
same banded/shared-frame join shapes, batch-sized — and only the
largest blob per component admits, mirroring the text admission's
in-batch stage (operators/corpus_build._admission).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .multimodal import (
    audio_fingerprint,
    hash_bands,
    perceptual_hash,
    video_frame_hashes,
)

LAYER = "index"
T_HASHES = "md_hashes"
T_BANDS = "md_bands"
T_FRAMES = "md_frames"
T_ADMITTED = "md_admitted"

# one banding contract across modalities (multimodal.py): 4 bands,
# pigeonhole-exact recall for Hamming distance <= 3
BANDS = 4
IMAGE_BITS = 64
AUDIO_BITS = 16


def _signatures(media: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(hashes, bands, frames) for a media frame — the complete index
    payload of a batch. Hashes/bands carry a modality tag so one probe
    join serves both banded families; frames are the video ledger.
    Undecodable payloads contribute no rows anywhere (the honest
    opaque split of the extractors)."""
    img = perceptual_hash(media).where(F.col("ahash").isNotNull()).select(
        "media_id", F.lit("image").alias("modality"), F.col("ahash").alias("h")
    )
    aud = audio_fingerprint(media).where(F.col("ehash").isNotNull()).select(
        "media_id", F.lit("audio").alias("modality"), F.col("ehash").alias("h")
    )
    hashes = img.unionByName(aud)
    bands = hash_bands(img, "media_id", "h", BANDS, IMAGE_BITS).unionByName(
        hash_bands(aud, "media_id", "h", BANDS, AUDIO_BITS)
    ).select("media_id", "modality", "band_idx", "band_val")
    frames = (
        video_frame_hashes(media).select("media_id", "ahash").distinct()
    )
    return hashes, bands, frames


def _intra_edges(
    hashes: DataFrame,
    bands: DataFrame,
    frames: DataFrame,
    max_dist_image: int,
    max_dist_audio: int,
    min_shared_frames: int,
) -> DataFrame:
    """Near-dup edges WITHIN one batch, from its already-computed
    signatures (no re-decode): banded-Hamming self-join for image and
    audio (one join, modality-tagged, popcount verify), shared-frame
    containment for video — the same shapes as the ledger probe,
    batch-sized. Returns (a, b, modality, score) with a < b."""
    cand = (
        bands.select(
            F.col("media_id").alias("a"), "modality", "band_idx", "band_val"
        )
        .join(
            bands.select(
                F.col("media_id").alias("b"), "modality", "band_idx", "band_val"
            ),
            ["modality", "band_idx", "band_val"],
        )
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "modality")
        .distinct()
    )
    max_dist = (
        F.when(F.col("modality") == "image", F.lit(max_dist_image))
        .otherwise(F.lit(max_dist_audio))
    )
    banded = (
        cand.join(
            hashes.select(
                F.col("media_id").alias("a"), "modality", F.col("h").alias("ha")
            ),
            ["a", "modality"],
        )
        .join(
            hashes.select(
                F.col("media_id").alias("b"), "modality", F.col("h").alias("hb")
            ),
            ["b", "modality"],
        )
        .select(
            "a", "b", "modality",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("score"),
        )
        .where(F.col("score") <= max_dist)
    )
    video = (
        frames.select(F.col("media_id").alias("a"), "ahash")
        .join(frames.select(F.col("media_id").alias("b"), "ahash"), ["ahash"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count_distinct("ahash").alias("score"))
        .where(F.col("score") >= min_shared_frames)
        .select("a", "b", F.lit("video").alias("modality"), "score")
    )
    return banded.unionByName(video)


def build(wh, media: DataFrame, run_id: int) -> None:
    """Initial (or rebuild-by-replacement) ledger from a media corpus:
    one decode pass per modality, all four tables overwritten under
    one atomic commit."""
    hashes, bands, frames = _signatures(media)
    wh.begin_run(run_id)
    wh.overwrite(LAYER, T_HASHES, hashes)
    wh.overwrite(LAYER, T_BANDS, bands)
    wh.overwrite(LAYER, T_FRAMES, frames)
    wh.overwrite(LAYER, T_ADMITTED, media.select("media_id"))
    wh.commit_run(run_id)


def optimize(wh, run_id: int, band_files: int | None = None) -> None:
    """Storage maintenance for an incrementally-grown media ledger,
    under one atomic commit: the three row-store tables compact to
    block-sized files, and ``md_bands`` — the table every batch PROBES
    by (modality, band_idx, band_val) — is additionally laid out in
    Z-ORDER on its probe key. Per-batch appends leave every small file
    spanning the whole band-value space, so a band-key PREDICATE must
    open ALL of them; after the z layout each band key lives in one
    file's min/max range (tests/test_media_index.py pins files-touched
    before/after). The probe itself is an equi-JOIN — a join alone
    pushes nothing to the scan (the round-13 DPP lesson), which is why
    ingest() turns the batch's bounded band-key set into a literal
    pushed filter (_static_band_filter): that filter is what converts
    this layout into skipped row groups at probe time (runtime
    records-read receipt in SCALE.md r14). At 100 TB this is the
    difference between a daily probe reading the colliding slivers of
    the ledger and re-reading all of it.
    ``band_files`` overrides the bytes-derived file count (probes and
    tests); the dedup_index twin is :func:`dedup_index.optimize`."""
    bands_tbl = wh.read(LAYER, T_BANDS)
    if bands_tbl is None:
        # mirror ingest's missing-index contract, and check BEFORE
        # begin_run — failing after would leave an open run to recover
        raise ValueError(
            f"media band index not built: table {LAYER}.{T_BANDS} is "
            f"missing in this warehouse — nothing to optimize; call "
            f"build() first"
        )
    wh.begin_run(run_id)
    # hashes verify-scan locality: range-sorted on media_id so the
    # probe's literal candidate-id filter skips non-candidate row
    # groups (the dedup_index.optimize shingle discipline)
    wh.compact(LAYER, T_HASHES, zorder_by=["media_id"])
    for t in (T_FRAMES, T_ADMITTED):
        wh.compact(LAYER, t)
    if band_files is None:
        wh.compact(LAYER, T_BANDS,
                   zorder_by=["modality", "band_idx", "band_val"])
    else:
        wh.overwrite(
            LAYER, T_BANDS, bands_tbl,
            zorder_by=["modality", "band_idx", "band_val"],
            zorder_files=band_files,
        )
    wh.commit_run(run_id)


def ingest(
    wh,
    batch: DataFrame,
    run_id: int | None = None,
    max_dist_image: int = 3,
    max_dist_audio: int = 3,
    min_shared_frames: int = 1,
    commit: bool = True,
    static_probe_keys: int = 1024,
    static_probe_min_bytes: int | None = None,
) -> DataFrame:
    """Admit a media batch against the persisted ledger; returns the
    admission frame (media_id, admitted, dup_of, via, score) for every
    batch blob — ``via`` names the modality of the winning match,
    ``score`` its Hamming distance (banded modalities) or shared-frame
    count (video); the winning partner is the smallest ledger id.

    Steps (the LEDGER probes join the batch's signatures against the
    stored tables — never a re-decode of the corpus; the one
    batch×batch join is the bounded intra-batch stage of step 5):
    1. replay guard: batch ids already in ``md_admitted`` report
       admitted with no partner and are NOT re-appended (foreachBatch
       redelivery discipline, mirrored from dedup_index.ingest).
    2. decode the new blobs once per modality (Arrow mapInPandas).
    3. banded probe: batch bands ⋈ md_bands on (modality, band_idx,
       band_val) — one join serves image and audio; candidates verify
       with the true popcount against md_hashes. When the ledger is
       big enough to repay the filter's fixed collect latency
       (``static_probe_min_bytes`` — None reads dedup_index's
       STATIC_PROBE_MIN_BYTES default, the r15 cost-based switch on
       manifest bytes; 0 forces it on) AND the batch's distinct band
       keys fit ``static_probe_keys`` (bounded collect), the ledger
       side is ALSO scan-restricted by a literal pushed filter so
       optimize()'s z-ordered row-group stats skip the non-colliding
       ledger instead of reading it linearly (the
       dedup_index._static_band_filter discipline; results identical
       either way — the join re-checks the full key).
    4. video probe: batch frame hashes ⋈ md_frames on the 64-bit hash,
       pairs kept at >= ``min_shared_frames`` distinct shared hashes.
    5. INTRA-BATCH stage over the ledger-admitted blobs: cluster them
       on their own signature edges (same join shapes, batch-sized)
       and keep only the largest payload per component — same-batch
       twins can no longer both admit. Losers report dup_of = the
       in-batch winner (via/score from their best direct edge to it;
       NULL when the connection is transitive-only).
    6. admitted blobs' hashes/bands/frames + their ids APPEND to the
       four tables under one atomic commit — a later batch near-dupping
       a blob admitted THIS batch rejects against the grown ledger.

    ``commit=False`` is the WHAT-IF mode: verdicts against the current
    ledger, nothing appended, ``run_id`` not required.
    """
    if commit:
        # roll back any crashed ingest before probing: uncommitted
        # appends left visible would make the replay guard report blobs
        # 'admitted' whose admission never committed (the corpus_build
        # recovery-before-resume discipline). Skipped in WHAT-IF mode —
        # a read-only preview must not mutate the warehouse.
        wh.recover()
    stored_bands = wh.read(LAYER, T_BANDS)
    if stored_bands is None:
        raise ValueError(
            f"media ledger not built: table {LAYER}.{T_BANDS} is missing in "
            f"this warehouse — call media_index.build() (or ingest into a "
            f"warehouse that has one) before admitting batches"
        )
    stored_hashes = wh.read(LAYER, T_HASHES)
    stored_frames = wh.read(LAYER, T_FRAMES)
    admitted_ledger = wh.read(LAYER, T_ADMITTED)

    batch_ids = batch.select("media_id")
    new_media = batch.join(
        F.broadcast(
            admitted_ledger.join(
                F.broadcast(batch_ids), ["media_id"], "left_semi"
            )
        ),
        ["media_id"],
        "left_anti",
    )

    hashes, bands, frames = _signatures(new_media)
    hashes = hashes.persist()
    bands = bands.persist()
    frames = frames.persist()

    # banded probe (image + audio in ONE join): candidates meet on the
    # exact band key; verify re-reads the full hashes for the popcount.
    # The ledger scan is statically restricted to the batch's bounded
    # band-key set (literal pushed filter + z-ordered row-group stats;
    # measured receipt in SCALE.md r14) — the join still decides. The
    # r15 cost-based switch gates each filter on the restricted table's
    # manifest bytes (fixed collect latency vs ledger-proportional
    # saving; dedup_index's rationale).
    from .dedup_index import (
        STATIC_PROBE_MIN_BYTES, _static_band_filter,
    )

    if static_probe_min_bytes is None:
        static_probe_min_bytes = STATIC_PROBE_MIN_BYTES
    bands_keys = static_probe_keys if (
        (wh.table_bytes(LAYER, T_BANDS) or 0) >= static_probe_min_bytes
    ) else 0
    probe_bands = _static_band_filter(
        stored_bands, bands, bands_keys,
        key_cols=("modality", "band_idx", "band_val"), val_col="band_val",
    )
    cand = (
        bands.select(
            F.col("media_id").alias("a"), "modality", "band_idx", "band_val"
        )
        .join(
            probe_bands.select(
                F.col("media_id").alias("b"), "modality", "band_idx", "band_val"
            ),
            ["modality", "band_idx", "band_val"],
        )
        .select("a", "b", "modality")
        .distinct()
        .persist()  # feeds the verify join AND the bounded b-id collect
    )
    # verify-scan restriction (the dedup_index r14 discipline): the
    # candidate ledger-id set is LSH-bounded, so when it fits the cap
    # push it as a literal media_id IN — optimize()'s media_id-sorted
    # hashes layout then skips the non-candidate ledger row groups
    # instead of reading the O(ledger) hash table per batch. The join
    # below re-checks the ids, so results are identical either way.
    # Same cost-based gate, keyed off the hash table this restricts.
    if static_probe_keys > 0 and (
        (wh.table_bytes(LAYER, T_HASHES) or 0) >= static_probe_min_bytes
    ):
        bids = cand.select("b").distinct().limit(static_probe_keys + 1).collect()
        if len(bids) <= static_probe_keys:
            idset = sorted(r["b"] for r in bids)
            stored_hashes = (
                stored_hashes.where(F.col("media_id").isin(idset))
                if idset
                else stored_hashes.where(F.lit(False))
            )
    max_dist = (
        F.when(F.col("modality") == "image", F.lit(max_dist_image))
        .otherwise(F.lit(max_dist_audio))
    )
    banded_hits = (
        cand.join(
            hashes.select(
                F.col("media_id").alias("a"),
                F.col("modality"),
                F.col("h").alias("ha"),
            ),
            ["a", "modality"],
        )
        .join(
            stored_hashes.select(
                F.col("media_id").alias("b"),
                F.col("modality"),
                F.col("h").alias("hb"),
            ),
            ["b", "modality"],
        )
        .select(
            "a", "b", "modality",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("score"),
        )
        .where(F.col("score") <= max_dist)
    )
    video_hits = (
        frames.select(F.col("media_id").alias("a"), "ahash")
        .join(
            stored_frames.select(F.col("media_id").alias("b"), "ahash"),
            ["ahash"],
        )
        .groupBy("a", "b")
        .agg(F.count_distinct("ahash").alias("score"))
        .where(F.col("score") >= min_shared_frames)
        .select("a", "b", F.lit("video").alias("modality"), "score")
    )
    hits = banded_hits.unionByName(video_hits)

    # deterministic winner: smallest ledger id; its modality/score ride
    # along via min_by-style struct ordering on (b, modality). Persisted:
    # it feeds the verdict frame AND the intra-batch stage's survivor
    # set, and the CC below fires several actions over it.
    best = hits.groupBy(F.col("a").alias("media_id")).agg(
        F.min(F.struct("b", "modality", "score")).alias("_w")
    ).persist()
    admission = (
        batch_ids.join(best, ["media_id"], "left")
        .select(
            "media_id",
            F.col("_w").isNull().alias("admitted"),
            F.col("_w.b").alias("dup_of"),
            F.col("_w.modality").alias("via"),
            F.col("_w.score").alias("score"),
        )
    )

    # intra-batch stage: the ledger can only reject against STORED
    # blobs, so a same-batch near-dup pair both pass it. Cluster the
    # ledger-admitted new blobs over their own signature edges (same
    # banded/shared-frame shapes, batch-sized), keep the largest
    # payload per component (smallest id on ties — the text admission's
    # survivor policy), and reject the rest with dup_of = the in-batch
    # winner; via/score come from the loser's best direct edge to it
    # (NULL when the link is transitive-only).
    from . import dedup

    ok_ids = new_media.select("media_id").join(
        F.broadcast(best.select("media_id")), ["media_id"], "left_anti"
    )
    edges = _intra_edges(
        hashes, bands, frames, max_dist_image, max_dist_audio,
        min_shared_frames,
    ).join(
        F.broadcast(ok_ids.select(F.col("media_id").alias("a"))), ["a"],
        "left_semi",
    ).join(
        F.broadcast(ok_ids.select(F.col("media_id").alias("b"))), ["b"],
        "left_semi",
    ).persist()
    # the common case — a batch with no same-day twins — skips the
    # iterative CC (several jobs of fixed overhead) entirely
    if edges.limit(1).count() > 0:
        labels = dedup.components_from_edges(
            edges.select("a", "b"), ok_ids, "media_id"
        )
        sized = new_media.select(
            "media_id", F.octet_length("payload").cast("long").alias("n_bytes")
        )
        kept = dedup.survivors_from_labels(labels, sized, "media_id", "n_bytes")
        losers = (
            labels.join(F.broadcast(kept.select("cluster_id", "kept_id")),
                        "cluster_id")
            .where(F.col("media_id") != F.col("kept_id"))
            .select("media_id", F.col("kept_id").alias("dup_of"))
        )
        sym = edges.unionByName(
            edges.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "modality",
                "score",
            )
        ).select(
            F.col("a").alias("_m"), F.col("b").alias("_w2"), "modality",
            "score",
        )
        inb = (
            losers.join(
                sym,
                (F.col("media_id") == F.col("_m"))
                & (F.col("dup_of") == F.col("_w2")),
                "left",
            )
            .groupBy("media_id", "dup_of")
            # "best edge" = CLOSEST match. Ranked by a DOCUMENTED
            # modality priority first, then within-modality closeness:
            # a video edge means actual shared decoded frames — exact
            # duplication evidence — so it deliberately outranks the
            # distance-band (Hamming) evidence of image/audio edges;
            # image and audio then compare on the same 64-bit Hamming
            # scale (lower = closer), with more shared frames = closer
            # within video. (The raw scales are incomparable — a naive
            # min over negated-count vs distance would let every video
            # edge win only by sign accident.)
            .agg(
                F.min(
                    F.struct(
                        F.when(F.col("modality") == "video", F.lit(0))
                        .otherwise(F.lit(1)).alias("strength"),
                        F.when(F.col("modality") == "video", -F.col("score"))
                        .otherwise(F.col("score"))
                        .alias("closeness"),
                        F.col("modality").alias("modality"),
                        F.col("score").alias("score"),
                    )
                ).alias("_e")
            )
            .select(
                "media_id",
                F.col("dup_of").alias("_ib_dup"),
                F.col("_e.modality").alias("_ib_via"),
                F.col("_e.score").alias("_ib_score"),
            )
        )
        admission = (
            admission.join(inb, ["media_id"], "left")
            .select(
                "media_id",
                (F.col("admitted") & F.col("_ib_dup").isNull()).alias("admitted"),
                F.coalesce("dup_of", "_ib_dup").alias("dup_of"),
                F.coalesce("via", "_ib_via").alias("via"),
                F.coalesce("score", "_ib_score").alias("score"),
            )
        )

    if not commit:
        for frame in (hashes, bands, frames, best, edges, cand):
            dedup._PERSISTED_SHINGLES.append(frame)
        return admission

    if run_id is None:
        raise ValueError("run_id is required when commit=True")
    # materialize the verdict ONCE — the four appends and the returned
    # frame all read this checkpoint, never re-running the probe
    admission = admission.localCheckpoint()
    # only NEW admitted blobs append (replayed ids are admitted in the
    # verdict but already present in every table)
    adm_ids = admission.where("admitted").select("media_id").join(
        F.broadcast(new_media.select("media_id")), ["media_id"], "left_semi"
    )
    if adm_ids.limit(1).count() == 0:
        # full replay / all-rejected batch: the ledger is already
        # exactly right — skip the four appends and the commit (a
        # steady-state re-ingest costs the probe, not a table version)
        for f in (hashes, bands, frames, best, edges, cand):
            f.unpersist()
        return admission
    wh.begin_run(run_id)
    wh.append(
        LAYER, T_HASHES,
        hashes.join(F.broadcast(adm_ids), ["media_id"], "left_semi"),
    )
    wh.append(
        LAYER, T_BANDS,
        bands.join(F.broadcast(adm_ids), ["media_id"], "left_semi"),
    )
    wh.append(
        LAYER, T_FRAMES,
        frames.join(F.broadcast(adm_ids), ["media_id"], "left_semi"),
    )
    wh.append(LAYER, T_ADMITTED, adm_ids)
    wh.commit_run(run_id)
    for f in (hashes, bands, frames, best, edges, cand):
        f.unpersist()
    return admission
