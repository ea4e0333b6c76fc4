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

from pyspark.sql import DataFrame, Window, functions as F

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
) -> dict:
    """Run the full raw->shards pipeline over ``pages`` (``id_col``,
    ``html_col``) and commit every resulting table atomically under
    ``run_id``. Returns the export stats dict plus survivor/quarantine
    counts. Re-running over unchanged input rewrites the (small)
    survivor/quarantine tables but skips the shard export via its
    content token."""
    from .dedup import _PERSISTED_SHINGLES

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
    body = F.expr("substring(clean_text, length(title) + 2)")
    docs = clean.select(F.col(id_col).alias("doc_id"), body.alias("text"))
    kept = docs.where(text.quality_keep())
    red = text.with_pii_redaction(kept).select(
        "doc_id", F.col("redacted").alias("text")
    )
    # exact dedup before the (more expensive) near-dup stage: first
    # occurrence per redacted fingerprint survives
    w_fp = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        red.withColumn("_rn", F.row_number().over(w_fp))
        .where(F.col("_rn") == 1)
        .drop("_rn")
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
            "text", "cluster_id", "n_members",
        )
    )
    survdocs = sampling.holdout_split(survdocs, "doc_id").withColumn(
        "n_bpe_tokens", text.bpe_ish_token_count("text").cast("long")
    )
    train = survdocs.where(F.col("split") == "train")

    wh.begin_run(run_id)
    n_quarantined = wh.overwrite(LAYER, T_QUARANTINE, quarantine)
    n_survivors = wh.overwrite(LAYER, T_SURVIVORS, survdocs)
    res = export.export_shards(
        wh, train, run_id,
        size_col="n_bpe_tokens", key_col="doc_id",
        target_bytes=target_tokens, own_run=False,
    )
    wh.commit_run(run_id)
    return {**res, "n_quarantined": n_quarantined, "n_survivors": n_survivors}
