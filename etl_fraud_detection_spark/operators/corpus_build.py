"""One-commit corpus build: raw crawl HTML -> training shards.

The end-to-end artifact the training-data pipeline exists to produce,
composed from the SAME operators the standalone catalog queries use:

  0. html_extract      — boilerplate-stripped clean text; torn pages
                         route to an in-plan quarantine (never fail the
                         load) .................. operators/extraction.py
  1. quality gate      — inline keep predicate over the extracted BODY
                         (title line stripped), fused into the scan
                         ........................ operators/text.quality_keep
  2. PII redaction     — typed placeholder tokens, pure regexp codegen
                         ........................ operators/text.with_pii_redaction
  3. exact dedup       — first doc per redacted-text fingerprint
  4. near-dup survivors— MinHash+LSH clusters -> keep-largest per
                         cluster ................ operators/dedup.cluster_survivors
  5. holdout split     — frozen md5-bucket 90/5/5 AFTER survivor
                         selection, so near-dup copies can never
                         straddle a train/test boundary
                         ........................ operators/sampling.holdout_split
  6. shard export      — the train split written as token-budgeted
                         shards (size_col = BPE-ish token count: shard
                         sizing IS sequence packing at shard
                         granularity) ........... operators/export.export_shards

Transactionality is the point of this module: every warehouse write —
quarantine, survivor table, shard table, per-shard checksums, export
manifest — rides ONE ``Warehouse.begin_run``/``commit_run`` (the
reference's one-conn.commit-per-run discipline,
database.py:34-40, applied to a corpus build). A crash at ANY
stage rolls the whole corpus back to the previous committed version;
there is no partial-version state a reader can observe.

Scale shape: stages 0-3 are map-only / single-window over the corpus
scan; stage 4 is the banded LSH pipeline (candidates scale with
near-dup density, never corpus²); stage 5 is a pure projection; stage
6 is the two-job ranged export. Nothing here collects more than
bounded manifest scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, export, extraction, sampling, text

LAYER = "corpus"
T_QUARANTINE = "quarantine"
T_SURVIVORS = "survivors"


def build_corpus(
    wh,
    pages: DataFrame,
    run_id: int,
    tau: float = 0.8,
    target_tokens: int = 2048,
    html_col: str = "html",
    id_col: str = "doc_id",
    with_ledger: bool = False,
) -> dict:
    """Run the full raw->shards pipeline over ``pages`` (``id_col``,
    ``html_col``) and commit every resulting table atomically under
    ``run_id``. Returns the export stats dict plus survivor/quarantine
    counts. Re-running over unchanged input rewrites the (small)
    survivor/quarantine tables but skips the shard export via its
    content token.

    ``with_ledger=True`` additionally seeds the persisted near-dup
    band index (operators/dedup_index) from the survivor corpus inside
    the SAME commit — the prerequisite for incremental admission
    (:func:`admit_corpus_batch`), which probes that ledger instead of
    re-clustering the corpus per batch."""
    from .dedup import _PERSISTED_SHINGLES

    # roll back any crashed run FIRST: a crash mid-build leaves
    # flipped-but-uncommitted pointers (survivors without their shards)
    # visible, and both the export's token skip and a later admission's
    # replay guard would trust that state — silently losing docs
    wh.recover()

    # the extraction is the one Python (Arrow) boundary in the whole
    # build; downstream stages fire many actions (label-propagation
    # rounds, table writes, the export token aggregate), so persist it
    # or every action re-parses the raw corpus. Registered with the
    # dedup release list (bench/check_oracle unpersist after each query).
    ext = extraction.html_extract(
        pages, html_col=html_col, id_cols=(id_col,), on_error="quarantine"
    ).persist()
    _PERSISTED_SHINGLES.append(ext)
    quarantine = ext.where(F.col("_error").isNotNull()).select(id_col, "_error")
    clean = ext.where(F.col("_error").isNull())
    # the BODY is the clean text minus the title line html_extract
    # excavated — gate/dedup on content, not boilerplate-adjacent titles
    # clean_text is NFC by the extraction contract (html_extract
    # normalizes inside its Arrow stage): the stored survivor text,
    # its exact fp, and the seeded shingle ledger are all NFC, so a
    # later batch's byte-different Unicode twin rejects against them.
    body = F.expr("substring(clean_text, length(title) + 2)")
    docs = clean.select(F.col(id_col).alias("doc_id"), body.alias("text"))
    kept = docs.where(text.quality_keep())
    red = text.with_pii_redaction(kept).select(
        "doc_id", F.col("redacted").alias("text")
    )
    # exact dedup before the (more expensive) near-dup stage: first
    # occurrence per redacted fingerprint survives. Keep-first-drop-rest
    # is a PURE AGGREGATION — min(struct(doc_id, text)) per fingerprint
    # (doc_id leads the struct ordering; text rides along) — so partial
    # aggregation collapses a mass-duplicated page (the most common dup
    # mode of a crawl) map-side instead of piling every copy onto one
    # row_number reducer; no join, no window, one shuffle of ~distinct
    # rows (round-10 skew hardening, SCALE.md).
    uniq = (
        red.groupBy(F.md5("text").alias("_fp"))
        .agg(F.min(F.struct("doc_id", "text")).alias("_f"))
        .select(F.col("_f.doc_id").alias("doc_id"),
                F.col("_f.text").alias("text"))
    )
    # post-redaction corpus feeds clusters, the survivor join, the
    # split and the export token — one materialization, many consumers
    sized = uniq.withColumn("n_chars", F.length("text").cast("long")).persist()
    _PERSISTED_SHINGLES.append(sized)
    surv = dedup.cluster_survivors(sized, tau=tau)
    survdocs = (
        surv.join(sized, surv["kept_id"] == sized["doc_id"])
        .select(
            F.col("kept_id").alias("doc_id"),
            "text",
            # stored fingerprint: what incremental admission probes for
            # exact-dup rejection without rescanning survivor text
            F.md5("text").alias("fp"),
            "cluster_id", "n_members",
        )
    )
    survdocs = sampling.holdout_split(survdocs, "doc_id").withColumn(
        "n_bpe_tokens", text.bpe_ish_token_count("text").cast("long")
    )
    train = survdocs.where(F.col("split") == "train")

    wh.begin_run(run_id)
    n_quarantined = wh.overwrite(LAYER, T_QUARANTINE, quarantine)
    n_survivors = wh.overwrite(LAYER, T_SURVIVORS, survdocs)
    if with_ledger:
        from . import dedup_index

        fps = dedup_index._fps(
            survdocs.select("doc_id", "text"), normalize=False
        ).persist()
        _PERSISTED_SHINGLES.append(fps)
        wh.overwrite(dedup_index.LAYER, dedup_index.T_SHINGLES, fps)
        wh.overwrite(
            dedup_index.LAYER, dedup_index.T_BANDS,
            dedup_index._bands_of(fps, dedup_index.NUM_HASHES, dedup_index.BANDS),
        )
    res = export.export_shards(
        wh, train, run_id,
        size_col="n_bpe_tokens", key_col="doc_id",
        target_bytes=target_tokens, own_run=False,
    )
    wh.commit_run(run_id)
    return {**res, "n_quarantined": n_quarantined, "n_survivors": n_survivors}


T_ADMISSIONS = "admissions"


def _admission(
    wh,
    pages: DataFrame,
    tau: float,
    html_col: str,
    id_col: str,
):
    """Shared core of the admission paths: extract/gate/redact the
    batch, then stage the rejection cascade against the COMMITTED
    corpus — intra-batch exact dup, stored-fingerprint exact dup,
    band-ledger near dup (dedup_index.ingest, read-only), and finally
    INTRA-BATCH near dup: the ledger-admitted docs run the same LSH
    pair generator + connected-components survivor pick the full build
    uses (batch-sized input, bounded cost), so two near-identical
    same-day crawl pages can never both admit — and can never land in
    DIFFERENT holdout splits via their md5 buckets, the train/test
    contamination the split-after-survivors ordering exists to
    prevent. Non-survivors report near_dup with the in-batch survivor
    (largest text, smallest id on ties) as dup_of. Returns
    (verdicts, fresh): verdicts covers EVERY batch page with
    (doc_id, status, dup_of); fresh is (doc_id, text, fp) for the docs
    that survived the gate/exact cascade — callers derive the admitted
    set as ``fresh ⋉ verdicts[status=admitted]`` (replayed ids tag
    admitted too but are disjoint from fresh), AFTER checkpointing
    verdicts, so the probe plan composes into exactly one executed
    frame. All heavy intermediates register with the shared release
    list; nothing is written."""
    from . import dedup_index
    from .dedup import _PERSISTED_SHINGLES

    surv = wh.read(LAYER, T_SURVIVORS)
    if surv is None:
        raise ValueError(
            "no committed corpus to admit into: run "
            "build_corpus(..., with_ledger=True) first"
        )
    # corpus-level replay guard FIRST (the dedup_index twin of it only
    # covers the ledger): a batch doc whose id is already a survivor
    # was admitted by an earlier — possibly crashed-after-commit — run;
    # it idempotently reports admitted and skips the whole cascade
    # (including the extraction), and is never re-appended
    ids = pages.select(F.col(id_col).alias("doc_id"))
    replayed = ids.join(surv.select("doc_id"), "doc_id", "left_semi")
    pages = pages.join(
        surv.select(F.col("doc_id").alias(id_col)), [id_col], "left_anti"
    )
    ext = extraction.html_extract(
        pages, html_col=html_col, id_cols=(id_col,), on_error="quarantine"
    ).persist()
    _PERSISTED_SHINGLES.append(ext)
    quarantined = ext.where(F.col("_error").isNotNull()).select(
        F.col(id_col).alias("doc_id")
    )
    # clean_text is NFC by the extraction contract (html_extract
    # normalizes inside its Arrow stage): every downstream fingerprint
    # — the exact md5, the shingle minhash ledger, the stored survivor
    # text — sees the same bytes, so an NFD-encoded twin of an admitted
    # NFC page is caught as an exact dup instead of both admitting.
    body = F.expr("substring(clean_text, length(title) + 2)")
    docs = ext.where(F.col("_error").isNull()).select(
        F.col(id_col).alias("doc_id"), body.alias("text")
    )
    kept = docs.where(text.quality_keep())
    gated = docs.join(kept.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id"
    )
    red = text.with_pii_redaction(kept).select(
        "doc_id",
        F.col("redacted").alias("text"),
        F.md5("redacted").alias("fp"),
    )
    # batch exact dedup, skew-safe (round 10): the firsts are a
    # map-side-combinable min-struct AGGREGATE per fingerprint — a
    # batch of 10^6 identical pages collapses to one candidate per map
    # task instead of one min-over-window reducer — and `cand` IS the
    # aggregate's output (no second pass); only the dup rows join back
    # (AQE splits a hot fp join partition).
    # CHECKPOINT red, not persist (r16): red is the composition BASE of
    # the whole cascade — cand, fresh, the shingle fingerprints, the
    # bands, both band joins and the fused verify all build on it, and
    # a persist caches rows but leaves the full extract/gate/redact
    # LINEAGE in every one of those plans. Composed multiplicatively
    # (sh 3x per verify, bands 2x per self-join, ...) the admission
    # frame's tree reached ~380 cached-scan + ~1500 parquet-scan nodes
    # and Catalyst re-analysis dominated every downstream action
    # (measured: the `near` checkpoint spent its ~2 s on planning, not
    # execution). Truncating here costs nothing new — the extraction
    # job this forces is the same one the tier-1 probe triggered — and
    # collapses every downstream plan to leaf-sized.
    red = red.localCheckpoint()
    _PERSISTED_SHINGLES.append(red)
    cand = (
        red.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "text")).alias("_f"))
        .select(F.col("_f.doc_id").alias("doc_id"),
                F.col("_f.text").alias("text"), "fp")
    )
    intra = (
        red.join(cand.select("fp", F.col("doc_id").alias("_first")), "fp")
        .where(F.col("doc_id") != F.col("_first"))
        .select("doc_id", F.col("_first").alias("dup_of"))
    )
    stored = (
        cand.join(
            surv.select("fp", F.col("doc_id").alias("sv_id")), "fp"
        )
        .groupBy("doc_id")
        .agg(F.min("sv_id").alias("dup_of"))
    )
    # fresh is the SECOND composition base (r16): the batch every
    # ingest-side frame (fingerprints, bands, both band joins, the
    # fused verify) builds on, and its lazy plan drags the survivors
    # read + the exact-dup cascade into each of those compositions
    # (~340 cached-scan / ~1370 parquet-scan nodes in the admission
    # frame with only `red` truncated). One batch-sized checkpoint —
    # a cached-read + one survivors scan — makes it a leaf.
    fresh = cand.join(
        stored.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint()
    # intra_pairs=True derives the batch×batch near-dup pairs from the
    # SAME fingerprints/bands the ledger probe computes — one extra
    # band self-join instead of a second full shingle/signature pass.
    # normalize=False: batch text is NFC already (html_extract's
    # Arrow-stage contract) — skip the redundant per-branch Arrow hop.
    near, ipairs, icand = dedup_index.ingest(
        wh, fresh.select("doc_id", "text"), tau=tau, commit=False,
        intra_pairs=True, normalize=False,
    )
    # ipairs reads ingest's FUSED verify cache (r16): ledger and
    # in-batch candidates verified in one _jaccard_between pass,
    # persisted inside ingest and registered for release there. The
    # tier-2 emptiness probe below therefore materializes BOTH verdict
    # families in one job — the `near` checkpoint (pair-bearing) or
    # the lazy verdict union (steady state) then reads that cache
    # instead of running its own ledger-verify pipeline (the r15
    # two-pass shape measured ~1.9 s of checkpoint time re-verifying
    # what the probe had just computed).

    def tag(df: DataFrame, status: str, with_dup: bool = False) -> DataFrame:
        dup = F.col("dup_of") if with_dup else F.lit(None).cast("long")
        return df.select(
            "doc_id", F.lit(status).alias("status"), dup.alias("dup_of")
        )

    def base_verdicts():
        return (
            tag(replayed, "admitted")
            .unionByName(tag(quarantined, "quarantined"))
            .unionByName(tag(gated, "gated"))
            .unionByName(tag(intra, "exact_dup", True))
            .unionByName(tag(stored, "exact_dup", True))
        )

    # FIRST action: TIERED emptiness probe of the intra-pair set, both
    # tiers correct over-approximations of the pair set the CC would
    # see (filtering to ledger survivors only ever removes pairs).
    # Tier 1 probes the raw BAND COLLISIONS (batch_bands self-join —
    # no shingle explode, no jaccard): the steady-state daily batch
    # has no same-day twins, so no two docs share a band bucket and
    # the expensive verify never runs at all. Only a colliding batch
    # pays tier 2, the verified-pair probe (a sub-tau false collision
    # still resolves pair-free there and keeps the steady shape) —
    # and tier 2's job IS the fused ledger+intra verify (r16), so a
    # pair-bearing batch's `near` checkpoint below reads its cache.
    # Either probe's job materializes the persisted fingerprints/bands
    # every job after reads from cache. Tier 1 keeps limit(1) (finding
    # one collision is enough to demote to tier 2), but tier 2 is a
    # FULL count on purpose: a limit(1) probe computes only the cache
    # partitions it needs to surface one row, leaving the rest of the
    # fused verify to re-run inside the `near` checkpoint and the
    # filtered-pair checkpoint (measured +3 s per pair-bearing batch);
    # the unlimited scan materializes the whole verdict cache in this
    # one job. This ordering keeps round 7's ZERO-checkpoint shape for
    # the committing pair-free batch.
    if icand.limit(1).count() == 0 or ipairs.count() == 0:
        # STEADY STATE: no verified in-batch pairs, so no CC and no
        # survivor pick — keep `near` LAZY with a when-split single
        # union branch (round 7's shape; a where-split would execute
        # the probe plan twice, and a localCheckpoint here measured
        # ~+1.5s per batch for nothing). The verdict union is the one
        # composition of the probe plan; the admitted-doc set is
        # DERIVED FROM THE VERDICTS by the callers (admit_corpus_batch
        # checkpoints verdicts first and semi-joins `fresh` against
        # the checkpoint), so the probe plan is analyzed/executed
        # exactly once per batch — not once per returned frame.
        near_tagged = near.select(
            "doc_id",
            F.when(F.col("admitted"), F.lit("admitted"))
            .otherwise(F.lit("near_dup")).alias("status"),
            F.when(~F.col("admitted"), F.col("dup_of"))
            .cast("long").alias("dup_of"),
        )
        verdicts = base_verdicts().unionByName(near_tagged)
        return verdicts, fresh

    # PAIR-BEARING batch: `near` now feeds several consumers (verdict
    # union, the survivor filter, the admitted set) and the CC consumes
    # its edge input many times per doubling round — CHECKPOINT both
    # (not persist): composed lazily into five consumers the probe plan
    # multiplies into a gigabyte-scale plan string whose ANALYSIS alone
    # dominates wall time (measured: 538s -> ~20s at sf0.01).
    from . import dedup

    near = near.localCheckpoint()
    ok_ids = near.where(F.col("admitted")).select("doc_id")
    # intra-batch near-dup stage over the LEDGER-ADMITTED docs: the
    # verified batch pairs (ends filtered to ledger survivors — a
    # per-doc property, so the pair set equals one computed over that
    # subset) + the shared pointer-doubling CC + keep-largest survivor.
    # Ledger precedence: a doc near-dupping BOTH the corpus and a
    # batchmate reports the corpus partner (it never reaches this
    # stage).
    # checkpoint FIRST, decide emptiness on the materialized result
    # (r16): the old probe-then-checkpoint tail ran the filter twice —
    # once for limit(1).count(), once for the checkpoint (~0.7 s + ~0.6 s
    # measured); isEmpty over the checkpointed partitions is one
    # near-free cached scan, so the pair-bearing batch pays one job
    # here, not two. The all-ends-rejected corner (previously the
    # probe's fast path) now pays this same single checkpoint — it was
    # paying the probe anyway.
    ipairs = (
        ipairs.select("a", "b")
        .join(F.broadcast(ok_ids.select(F.col("doc_id").alias("a"))), ["a"],
              "left_semi")
        .join(F.broadcast(ok_ids.select(F.col("doc_id").alias("b"))), ["b"],
              "left_semi")
        .localCheckpoint()
    )
    if ipairs.isEmpty():
        # every pair had a ledger-rejected end: nothing to cluster
        inbatch = ipairs.sparkSession.createDataFrame(
            [], "doc_id long, dup_of long"
        )
    else:
        sized = fresh.select(
            "doc_id", F.length("text").cast("long").alias("n_chars")
        )
        labels = dedup.components_from_edges(ipairs, ok_ids, "doc_id")
        kept = dedup.survivors_from_labels(labels, sized, "doc_id", "n_chars")
        inbatch = (
            labels.join(F.broadcast(kept.select("cluster_id", "kept_id")),
                        "cluster_id")
            .where(F.col("doc_id") != F.col("kept_id"))
            .select("doc_id", F.col("kept_id").alias("dup_of"))
            .localCheckpoint()
        )

    ledger_rej = near.where(~F.col("admitted")).select(
        "doc_id", F.col("dup_of").cast("long").alias("dup_of")
    )
    survivors_ok = near.where(F.col("admitted")).select("doc_id").join(
        inbatch.select("doc_id"), "doc_id", "left_anti"
    )
    verdicts = (
        base_verdicts()
        .unionByName(tag(ledger_rej, "near_dup", True))
        .unionByName(tag(inbatch.select("doc_id", "dup_of"), "near_dup", True))
        .unionByName(tag(survivors_ok, "admitted"))
    )
    return verdicts, fresh


def admission_verdicts(
    wh,
    pages: DataFrame,
    tau: float = 0.8,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """READ-ONLY admission preview: the verdict for every page of a
    crawl batch against the committed corpus — (doc_id, status,
    dup_of) with status quarantined / gated / exact_dup / near_dup /
    admitted. Probes the stored survivor fingerprints and the
    persisted band ledger; writes nothing, so it is deterministic
    under repetition (the catalog query q_corpus_admit). The
    committing path is :func:`admit_corpus_batch`."""
    return _admission(wh, pages, tau, html_col, id_col)[0]


def admit_corpus_batch(
    wh,
    pages: DataFrame,
    run_id: int,
    tau: float = 0.8,
    target_tokens: int = 2048,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally ADMIT a crawl batch into the committed corpus —
    the daily path at 100 TB, where re-running build_corpus over the
    whole crawl is not an option. Batch cost scales with the batch:
    extraction/gate/redaction are map-only over the batch, the exact
    check probes stored fingerprints, the near-dup check is the
    batch×ledger band probe (never batch×batch, never corpus²), and
    the export appends ONLY the new shards.

    Everything the batch adds rides ONE atomic commit, mirroring the
    reference's per-run transaction discipline (etl.py:190-199's
    watermark increment + database.py:34-40's single commit):
    survivors append, band-ledger growth (nd_shingles/nd_bands),
    new training shards + their checksum rows + a batch manifest row,
    and the per-doc admission audit (``corpus.admissions``).

    Appended shard ids continue after the stored maximum and
    ``shuffle_pos`` continues the global permutation; ``start_offset``
    restarts per batch (byte offsets are shard-local state for a
    loader, not a global cumsum, once a corpus grows incrementally).

    IDEMPOTENT on replay: batch docs already present in the ledger
    report admitted (dedup_index's replay guard) and a batch that
    admits nothing commits nothing."""
    from . import dedup_index

    # recovery-before-resume: a crash between begin_run and commit_run
    # below leaves uncommitted survivors visible; without this rollback
    # the replay guard would report those docs 'admitted' while their
    # shards were never exported (silent doc loss)
    wh.recover()
    verdicts, fresh = _admission(wh, pages, tau, html_col, id_col)
    # freeze both BEFORE any table grows: the verdicts must describe
    # the pre-batch corpus even after the ledger/survivors appends.
    # verdicts first — the admitted set then derives from the
    # CHECKPOINTED verdicts (one semi-join over cached `fresh`), so
    # the admission probe plan executes once per batch, not once per
    # frame (the round-9 two-consumer residue).
    verdicts = verdicts.localCheckpoint()
    admitted = fresh.join(
        verdicts.where(F.col("status") == "admitted").select("doc_id"),
        "doc_id", "left_semi",
    ).localCheckpoint()
    from .dedup import release_shingles

    release_shingles()
    # replay guard at the corpus level: docs already in survivors were
    # admitted by an earlier (possibly crashed-after-commit) run
    already = admitted.join(
        wh.read(LAYER, T_SURVIVORS).select("doc_id"), "doc_id", "left_semi"
    )
    new = admitted.join(already, "doc_id", "left_anti")
    n_new = new.count()
    if n_new == 0:
        # nothing to admit (all-rejected batch, or a full replay):
        # survivors/ledger/shards stay untouched — only the audit log
        # records the batch (append-only event log keyed by run_id)
        wh.begin_run(run_id)
        wh.append(
            LAYER, T_ADMISSIONS,
            verdicts.withColumn("run_id", F.lit(run_id).cast("long")),
        )
        wh.commit_run(run_id)
        return {"n_admitted": 0, "n_new_shards": 0, "committed": False,
                "run_id": run_id}
    enriched = sampling.holdout_split(
        new.select(
            "doc_id", "text", "fp",
            # admitted docs matched no cluster: they are new singletons
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("n_members"),
        ),
        "doc_id",
    ).withColumn(
        "n_bpe_tokens", text.bpe_ish_token_count("text").cast("long")
    )
    train = enriched.where(F.col("split") == "train")
    # coalesce: a committed corpus whose train split was EMPTY still has
    # a training_shards table (export always writes it), and max() over
    # an empty table is NULL — the first admitted batch then starts at
    # shard 0 / position 0 instead of crashing on int(None)
    offs = wh.read(export.LAYER, export.T_SHARDS).select(
        F.coalesce(F.max("shard_id"), F.lit(-1)).cast("long").alias("ms"),
        F.coalesce(F.max("shuffle_pos"), F.lit(0)).cast("long").alias("mp"),
    ).collect()[0]
    assigned = export.shard_assignments(
        train, size_col="n_bpe_tokens", key_col="doc_id",
        target_bytes=target_tokens,
    ).select(
        *train.columns,
        (F.col("shuffle_pos") + F.lit(int(offs["mp"]))).alias("shuffle_pos"),
        "start_offset",
        (F.col("shard_id") + F.lit(int(offs["ms"]) + 1)).alias("shard_id"),
    )

    wh.begin_run(run_id)
    wh.append(LAYER, T_SURVIVORS, enriched)
    fps = dedup_index._fps(
        new.select("doc_id", "text"), normalize=False
    ).persist()
    wh.append(dedup_index.LAYER, dedup_index.T_SHINGLES, fps)
    wh.append(
        dedup_index.LAYER, dedup_index.T_BANDS,
        dedup_index._bands_of(fps, dedup_index.NUM_HASHES, dedup_index.BANDS),
    )
    wh.append(
        export.LAYER, export.T_SHARDS, assigned.repartition("shard_id")
    )
    newly = wh.read(export.LAYER, export.T_SHARDS).where(
        F.col("shard_id") > int(offs["ms"])
    )
    wh.append(
        export.LAYER, export.T_CHECKSUMS,
        export.shard_checksums(newly, "n_bpe_tokens", train.columns),
    )
    batch_token = export._content_token(
        train, "n_bpe_tokens", "doc_id", target_tokens
    )
    stats = newly.select(
        F.count("*").alias("n"),
        F.countDistinct("shard_id").alias("s"),
        # coalesce: an admitted batch whose docs ALL landed in val/test
        # appends zero shards, and sum() over none is NULL
        F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).cast("long").alias("b"),
    ).collect()[0]
    wh.append(
        export.LAYER, export.T_MANIFEST,
        pages.sparkSession.createDataFrame(
            [(batch_token, int(stats["n"]), int(stats["s"]), int(stats["b"]),
              int(wh._current(wh.path(export.LAYER, export.T_SHARDS))))],
            export.MANIFEST_SCHEMA,
        ),
    )
    wh.append(
        LAYER, T_ADMISSIONS,
        verdicts.withColumn("run_id", F.lit(run_id).cast("long")),
    )
    wh.commit_run(run_id)
    fps.unpersist()
    export.release_ranked()
    return {
        "n_admitted": n_new,
        "n_new_shards": int(stats["s"]),
        "committed": True,
        "run_id": run_id,
    }
