"""Persisted band-index incremental near-dup admission
(operators/dedup_index): the property that distinguishes a PERSISTED
index from the pure-DataFrame incremental operator is that admissions
GROW the ledger — a later batch near-dupping a doc admitted two
batches ago must reject against the stored index, with the original
corpus long out of scope."""

import pytest

from etl_fraud_detection_spark.operators import dedup_index
from etl_fraud_detection_spark.pipeline import Warehouse

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"
THIRD = "red orange yellow green blue indigo violet cyan magenta white"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "ndwh"))


def test_index_grows_across_batches(spark, wh):
    dedup_index.build(wh, _docs(spark, [(1, BASE), (2, OTHER)]), run_id=1)

    # batch 1: doc 10 duplicates ledger doc 1; doc 11 is new
    adm1 = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh, _docs(spark, [(10, BASE), (11, THIRD)]), run_id=2
        ).collect()
    }
    assert adm1 == {10: (False, 1), 11: (True, None)}

    # batch 2: doc 20 duplicates doc 11 — admitted only ONE batch ago,
    # never part of the original corpus; doc 21 is new
    adm2 = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh,
            _docs(spark, [(20, THIRD), (21, "zz yy xx ww vv uu tt ss rr qq")]),
            run_id=3,
        ).collect()
    }
    assert adm2 == {20: (False, 11), 21: (True, None)}

    # both index tables hold exactly the admitted doc set, atomically
    ids_sh = {r.doc_id for r in wh.read("index", "nd_shingles").select("doc_id").distinct().collect()}
    ids_bd = {r.doc_id for r in wh.read("index", "nd_bands").select("doc_id").distinct().collect()}
    assert ids_sh == ids_bd == {1, 2, 11, 21}


def test_rejected_doc_never_pollutes_index(spark, wh):
    """A rejected near-dup must leave no trace: a later exact copy of
    the REJECTED doc still resolves to the ORIGINAL ledger doc."""
    dedup_index.build(wh, _docs(spark, [(1, BASE)]), run_id=1)
    dedup_index.ingest(wh, _docs(spark, [(10, BASE)]), run_id=2)  # rejected
    adm = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh, _docs(spark, [(30, BASE)]), run_id=3
        ).collect()
    }
    assert adm == {30: (False, 1)}  # dup_of the original, 10 was never stored


def test_jaccard_threshold_respected(spark, wh):
    """A mild edit below tau must admit; identical text must reject
    with jaccard 1.0."""
    dedup_index.build(wh, _docs(spark, [(1, BASE)]), run_id=1)
    edited = "totally different words " + " ".join(BASE.split()[:3])
    rows = {
        r.doc_id: r
        for r in dedup_index.ingest(
            wh, _docs(spark, [(40, edited), (41, BASE)]), run_id=2, tau=0.8
        ).collect()
    }
    assert rows[40].admitted is True
    assert rows[41].admitted is False and rows[41].jaccard == 1.0


def test_ingest_replay_is_idempotent(spark, wh):
    """foreachBatch redelivery (crash between index commit and stream
    checkpoint): re-ingesting an already-indexed doc must report it
    admitted without self-matching, and must NOT duplicate its index
    rows."""
    dedup_index.build(wh, _docs(spark, [(1, BASE)]), run_id=1)
    dedup_index.ingest(wh, _docs(spark, [(11, THIRD)]), run_id=2)
    adm = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh, _docs(spark, [(11, THIRD)]), run_id=3
        ).collect()
    }
    assert adm == {11: (True, None)}
    assert wh.read("index", "nd_bands").where("doc_id = 11").count() == 3
    assert (
        wh.read("index", "nd_shingles").select("doc_id", "sh_fp").distinct().count()
        == wh.read("index", "nd_shingles").count()
    )


def test_index_layer_in_commit_manifest(spark, wh):
    """The index layer must participate in warehouse commit manifests:
    read_at() time travel resolves it, so retention protects it."""
    dedup_index.build(wh, _docs(spark, [(1, BASE)]), run_id=1)
    dedup_index.ingest(wh, _docs(spark, [(11, THIRD)]), run_id=2)
    at_build = wh.read_at("index", "nd_bands", 1)
    assert at_build is not None and at_build.select("doc_id").distinct().count() == 1
    at_ingest = wh.read_at("index", "nd_bands", 2)
    assert {r.doc_id for r in at_ingest.select("doc_id").distinct().collect()} == {1, 11}


def test_readonly_ingest_matches_commit_and_leaves_index_pristine(spark, wh):
    """commit=False must produce identical verdicts to the committing
    path and leave both index tables untouched."""
    from etl_fraud_detection_spark.operators import dedup

    dedup_index.build(wh, _docs(spark, [(1, BASE), (2, OTHER)]), run_id=1)
    batch = _docs(spark, [(10, BASE), (11, THIRD)])
    dry = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(wh, batch, commit=False).collect()
    }
    dedup.release_shingles()
    assert dry == {10: (False, 1), 11: (True, None)}
    ids = {r.doc_id for r in wh.read("index", "nd_bands").select("doc_id").distinct().collect()}
    assert ids == {1, 2}  # nothing appended
    wet = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(wh, batch, run_id=2).collect()
    }
    assert wet == dry


def test_commit_requires_run_id(spark, wh):
    dedup_index.build(wh, _docs(spark, [(1, BASE)]), run_id=1)
    with pytest.raises(ValueError, match="run_id"):
        dedup_index.ingest(wh, _docs(spark, [(10, OTHER)]))


def test_ingest_before_build_raises_clearly(spark, wh):
    with pytest.raises(ValueError, match="not built"):
        dedup_index.ingest(wh, _docs(spark, [(1, BASE)]), run_id=1)


def _parquet_files(wh, table):
    import os

    p = wh.path("index", table)
    vdir = wh._vdir(p, wh._current(p))
    return [
        os.path.join(root, f)
        for root, _, fs in os.walk(vdir)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compaction_preserves_probe_results_and_admission(spark, wh):
    """Compaction in anger: N append batches accrete small files; after
    pipeline.compact rewrites both index tables, (1) probe verdicts
    are unchanged row-for-row, (2) the replay guard still recognizes
    already-ingested docs (admission idempotence survives the file
    rewrite), and (3) the file count actually dropped — the property
    that restores scan/list efficiency at 100 TB."""
    dedup_index.build(wh, _docs(spark, [(1, BASE), (2, OTHER)]), run_id=1)
    batches = [
        [(10, THIRD)],
        [(20, "aa bb cc dd ee ff gg hh ii jj")],
        [(30, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10")],
    ]
    for i, rows in enumerate(batches):
        dedup_index.ingest(wh, _docs(spark, rows), run_id=2 + i)

    probe_batch = _docs(spark, [(99, BASE), (98, THIRD), (97, "zz yy xx")])
    before = sorted(
        tuple(r)
        for r in dedup_index.ingest(wh, probe_batch, commit=False).collect()
    )
    files_before = {t: len(_parquet_files(wh, t)) for t in ("nd_shingles", "nd_bands")}
    rows_before = {
        t: wh.read("index", t).count() for t in ("nd_shingles", "nd_bands")
    }
    assert files_before["nd_bands"] > 1  # appends really did accrete files

    for t in ("nd_shingles", "nd_bands"):
        n_files = wh.compact("index", t)
        assert n_files == 1  # toy size -> one target file

    after = sorted(
        tuple(r)
        for r in dedup_index.ingest(wh, probe_batch, commit=False).collect()
    )
    assert after == before
    for t in ("nd_shingles", "nd_bands"):
        assert wh.read("index", t).count() == rows_before[t]
        assert len(_parquet_files(wh, t)) < files_before[t]

    # admission after compaction: replays skip, near-dups of docs
    # admitted BEFORE the rewrite still reject
    adm = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh, _docs(spark, [(10, THIRD), (40, THIRD)]), run_id=9
        ).collect()
    }
    assert adm[10] == (True, None)  # replayed doc: skipped, not re-matched
    assert adm[40] == (False, 10)   # rejects against the compacted index


def test_nfd_twin_rejects_against_nfc_ledger(spark, wh):
    """_fps NFC-normalizes before shingling (text.nfc — the engine-wide
    contract): an NFD-encoded twin of an NFC ledger doc collides on
    every shingle fingerprint and rejects, instead of both admitting
    as byte-different 'new' content."""
    import unicodedata

    nfc_doc = "the café review praised the naïve décor and the crème " \
              "brûlée dessert menu highly"
    assert unicodedata.normalize("NFC", nfc_doc) == nfc_doc
    nfd_doc = unicodedata.normalize("NFD", nfc_doc)
    assert nfd_doc != nfc_doc
    dedup_index.build(wh, _docs(spark, [(1, nfc_doc), (2, OTHER)]), run_id=1)
    adm = {
        r.doc_id: (r.admitted, r.dup_of)
        for r in dedup_index.ingest(
            wh, _docs(spark, [(10, nfd_doc)]), run_id=2
        ).collect()
    }
    assert adm == {10: (False, 1)}


def test_optimize_on_missing_index_fails_before_run_opens(spark, wh):
    """optimize() on a warehouse with no band index must raise the
    clear missing-index error WITHOUT opening a run — the old shape
    crashed with an opaque AttributeError after begin_run, leaving an
    uncommitted run behind for the next writer to recover."""
    import pytest

    from etl_fraud_detection_spark.operators import media_index

    with pytest.raises(ValueError, match="not built"):
        dedup_index.optimize(wh, run_id=99, band_files=2)
    with pytest.raises(ValueError, match="not built"):
        media_index.optimize(wh, run_id=99, band_files=2)
    # no run was opened: a normal build + ingest works untouched
    dedup_index.build(wh, _docs(spark, [(1, BASE), (2, OTHER)]), run_id=1)
    assert dedup_index.ingest(
        wh, _docs(spark, [(10, THIRD)]), run_id=2
    ).count() == 1


def test_static_band_filter_changes_no_verdict_and_pushes_literal(spark, wh):
    """The bounded static band-key filter is a pure scan restriction:
    admission verdicts are identical with it on (forced via
    static_probe_min_bytes=0 — the r15 cost-based gate would otherwise
    rightly skip it at this fixture's ledger size), off
    (static_probe_keys=0), gated off by ledger size (the default), and
    with a cap the batch exceeds (filter steps aside) — and when on,
    the literal band_hash IN predicate reaches the stored band scan as
    a pushed filter, which is what lets optimize()'s z-order row-group
    stats skip the non-colliding ledger (runtime receipt in SCALE.md
    r14)."""
    docs = [(i, f"w{i} " * 3 + BASE) for i in range(8)]
    dedup_index.build(wh, _docs(spark, docs), run_id=1)
    batch = _docs(spark, [(100, BASE), (101, OTHER), (102, THIRD)])

    def verdicts(**kw):
        return sorted(
            (r.doc_id, r.admitted, r.dup_of)
            for r in dedup_index.ingest(wh, batch, commit=False, **kw).collect()
        )

    on = verdicts(static_probe_min_bytes=0)
    off = verdicts(static_probe_keys=0)
    gated = verdicts()  # default gate: tiny ledger -> filters skipped
    capped = verdicts(static_probe_keys=1, static_probe_min_bytes=0)
    assert on == off == gated == capped and on

    plan = dedup_index.ingest(
        wh, batch, commit=False, static_probe_min_bytes=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re
    assert re.search(r"In\(band_hash, \[", plan), plan


def test_static_band_filter_cost_gate_keys_off_ledger_bytes(spark, wh):
    """The r15 cost-based switch: below ``static_probe_min_bytes`` of
    ledger the probe plan keeps the plain equi-join (no literal
    band_hash IN pushed to the stored scan — the filter's fixed
    collect latency would cost more than the skipped rows save); at a
    threshold the fixture ledger clears, the literal appears. Verdicts
    are identical either way (pinned above); this pins the PLAN
    actually flips on the manifest-size variable."""
    import re

    docs = [(i, f"w{i} " * 3 + BASE) for i in range(8)]
    dedup_index.build(wh, _docs(spark, docs), run_id=1)
    batch = _docs(spark, [(100, BASE), (101, OTHER)])
    nbytes = wh.table_bytes(dedup_index.LAYER, dedup_index.T_BANDS)
    assert nbytes and nbytes > 0

    def plan(min_bytes):
        return dedup_index.ingest(
            wh, batch, commit=False, static_probe_min_bytes=min_bytes
        )._jdf.queryExecution().executedPlan().toString()

    below = plan(nbytes + 1)   # ledger smaller than the bar: gated off
    at = plan(nbytes)          # ledger meets the bar: filter on
    assert not re.search(r"In\(band_hash, \[", below), below
    assert re.search(r"In\(band_hash, \[", at), at
