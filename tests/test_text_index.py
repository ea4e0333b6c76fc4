"""Persisted inverted index (operators/text_index): query == in-plan
BM25 bit-for-bit, incremental build == single-pass build, exactly-once
admission, partition pruning on the probed term buckets."""

from pyspark.sql import Row, functions as F

from etl_fraud_detection_spark.operators import corpus, text_index
from etl_fraud_detection_spark.pipeline import Warehouse

TERMS = ["spark", "table", "window"]


def _docs(spark):
    rows = [
        (1, "spark runs a distributed table scan over the window frame"),
        (2, "the table has a window and a door and a table again"),
        (3, "nothing relevant here at all just filler words to read"),
        (4, "spark spark spark table"),
        (5, "window window table spark engine plans the query"),
        (6, "a longer document that mentions spark once among many many "
            "many other words stretching the document length out"),
    ]
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _key(df):
    return sorted(tuple(r) for r in df.collect())


class TestBuildAndQuery:
    def test_query_matches_inplan_bm25(self, spark, tmp_path):
        docs = _docs(spark)
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, docs, run_id=1)
        got = text_index.query(wh, TERMS)
        want = corpus.bm25_scores(docs, TERMS)
        assert _key(got) == _key(want)

    def test_rebuild_replaces_as_unit(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        smaller = _docs(spark).where("doc_id <= 3")
        text_index.build(wh, smaller, run_id=2)
        got = text_index.query(wh, TERMS)
        want = corpus.bm25_scores(smaller, TERMS)
        assert _key(got) == _key(want)


class TestIngest:
    def test_incremental_equals_single_pass(self, spark, tmp_path):
        docs = _docs(spark)
        whi = Warehouse(spark, str(tmp_path / "incr"))
        text_index.build(whi, docs.where("doc_id <= 3"), run_id=1)
        text_index.ingest(whi, docs.where("doc_id > 3"), run_id=2)
        whf = Warehouse(spark, str(tmp_path / "full"))
        text_index.build(whf, docs, run_id=1)
        assert _key(text_index.query(whi, TERMS)) == _key(
            text_index.query(whf, TERMS)
        )
        # stats tables merged exactly, not approximately
        assert _key(whi.read("index", "term_stats")) == _key(
            whf.read("index", "term_stats")
        )
        assert _key(whi.read("index", "corpus_stats")) == _key(
            whf.read("index", "corpus_stats")
        )

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        docs = _docs(spark)
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, docs.where("doc_id <= 4"), run_id=1)
        batch = docs.where("doc_id > 4")
        text_index.ingest(wh, batch, run_id=2)
        before = _key(text_index.query(wh, TERMS))
        n_post = wh.read("index", "postings").count()
        text_index.ingest(wh, batch, run_id=3)  # replay
        assert _key(text_index.query(wh, TERMS)) == before
        assert wh.read("index", "postings").count() == n_post

    def test_same_batch_duplicates_dropped(self, spark, tmp_path):
        docs = _docs(spark)
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, docs.where("doc_id <= 5"), run_id=1)
        dup_batch = docs.where("doc_id = 6").unionAll(docs.where("doc_id = 6"))
        text_index.ingest(wh, dup_batch, run_id=2)
        whf = Warehouse(spark, str(tmp_path / "full"))
        text_index.build(whf, docs, run_id=1)
        assert _key(text_index.query(wh, TERMS)) == _key(
            text_index.query(whf, TERMS)
        )


class TestPruning:
    def test_probe_prunes_to_probed_buckets(self, spark, tmp_path):
        # inputFiles() lists the relation BEFORE pruning, so pin the
        # executed plan: the postings scan must carry a PartitionFilter
        # equating the bucket column to the probed term's bucket, and
        # push the term equality into the parquet scan.
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        got = text_index.query(wh, ["spark"])
        plan = got._jdf.queryExecution().executedPlan().toString()
        (want,) = [
            r["b"]
            for r in spark.createDataFrame([("spark",)], "term string")
            .select(text_index._bucket(F.col("term")).alias("b"))
            .collect()
        ]
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m, "postings scan lost its partition filter"
        assert f"= {want})" in m.group(1), m.group(1)
        assert "EqualTo(term,spark)" in plan  # term pushed to the scan


class TestCompaction:
    def test_postings_compact_preserves_probe_and_pruning(self, spark, tmp_path):
        """Per-batch ingest accretes one file per touched bucket per
        batch; the warehouse's partition-aware compaction must collapse
        them without changing probe answers, admission state, or the
        bucket partition layout the pruning depends on."""
        docs = _docs(spark)
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, docs.where("doc_id <= 2"), run_id=1)
        for i, pred in enumerate(["doc_id in (3,4)", "doc_id in (5)", "doc_id in (6)"]):
            text_index.ingest(wh, docs.where(pred), run_id=10 + i)
        before = _key(text_index.query(wh, TERMS))
        n_files_before = len(
            wh.read("index", "postings").inputFiles()
        )
        wh.begin_run(50)
        wh.compact("index", "postings")
        wh.commit_run(50)
        after_df = text_index.query(wh, TERMS)
        assert _key(after_df) == before
        assert len(wh.read("index", "postings").inputFiles()) < n_files_before
        # pruning survives the rewrite
        plan = after_df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        # a post-compaction ingest still admits exactly-once
        text_index.ingest(wh, docs.where("doc_id = 6"), run_id=60)  # replay
        assert _key(text_index.query(wh, TERMS)) == before


class TestCrashRecovery:
    def test_crash_mid_ingest_rolls_back_all_four_tables(self, spark, tmp_path):
        """Ingest touches four tables under one journaled run; dying
        after the postings append but before the stats merges must
        leave NO partially-admitted batch — recover() restores the
        exact pre-ingest index and the batch re-admits cleanly."""
        docs = _docs(spark)
        root = str(tmp_path / "ix")
        wh = Warehouse(spark, root)
        text_index.build(wh, docs.where("doc_id <= 4"), run_id=1)
        before_q = _key(text_index.query(wh, TERMS))
        before_lens = _key(wh.read("index", "doc_lens"))

        batch = docs.where("doc_id > 4")
        boom = RuntimeError("simulated crash")
        orig_overwrite = Warehouse.overwrite
        calls = {"n": 0}

        def dying_overwrite(self, layer, table, df, partition_by=None):
            # die on the FIRST stats overwrite — after the postings
            # append already landed in the new (uncommitted) version
            if table == "term_stats":
                raise boom
            return orig_overwrite(self, layer, table, df, partition_by)

        Warehouse.overwrite = dying_overwrite
        try:
            try:
                text_index.ingest(wh, batch, run_id=2)
            except RuntimeError as e:
                assert e is boom
            else:
                raise AssertionError("crash did not fire")
        finally:
            Warehouse.overwrite = orig_overwrite

        # fresh handle, as a restarted process would have
        wh2 = Warehouse(spark, root)
        assert wh2.recover() == 2
        assert _key(text_index.query(wh2, TERMS)) == before_q
        assert _key(wh2.read("index", "doc_lens")) == before_lens
        # the batch admits cleanly after recovery, equal to single-pass
        text_index.ingest(wh2, batch, run_id=3)
        whf = Warehouse(spark, str(tmp_path / "full"))
        text_index.build(whf, docs, run_id=1)
        assert _key(text_index.query(wh2, TERMS)) == _key(
            text_index.query(whf, TERMS)
        )


class TestTopK:
    def test_topk_is_prefix_of_full_ranking(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        full = sorted(
            ((r["score_micro"], r["doc_id"]), tuple(r))
            for r in text_index.query(wh, TERMS).collect()
        )
        ranked = sorted(full, key=lambda x: (-x[0][0], x[0][1]))
        got = [tuple(r) for r in text_index.query(wh, TERMS, k=3).collect()]
        assert got == [t for _, t in ranked[:3]]

    def test_topk_plan_has_no_global_sort(self, spark, tmp_path):
        """The k form must compile to TakeOrderedAndProject
        (per-partition heaps + bounded driver merge) — a global Sort
        exchange would be the 100 TB scale-killer."""
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        plan = (
            text_index.query(wh, TERMS, k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan

    def test_query_many_matches_single_bit_for_bit(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        qsets = {"a": TERMS, "b": ["spark"], "c": ["door", "filler"]}
        many = text_index.query_many(wh, qsets)
        for qid, terms in qsets.items():
            got = sorted(
                tuple(r)[1:] for r in many.where(
                    F.col("query_id") == qid
                ).collect()
            )
            want = sorted(tuple(r) for r in text_index.query(wh, terms).collect())
            assert got == want, qid

    def test_query_many_topk_per_query(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        qsets = {"a": TERMS, "b": ["table", "window"]}
        many = text_index.query_many(wh, qsets, k=2)
        for qid, terms in qsets.items():
            got = [
                tuple(r)[1:]
                for r in many.where(F.col("query_id") == qid)
                .orderBy(F.col("score_micro").desc(), "doc_id").collect()
            ]
            want = [
                tuple(r)
                for r in text_index.query(wh, terms, k=2).collect()
            ]
            assert got == want, qid


class TestQueryText:
    def test_raw_string_equals_hand_tokenized(self, spark, tmp_path):
        """query_text must route the raw string through the SAME
        tokenize chain as indexing: duplicates collapse, and the result
        is bit-identical to the hand-tokenized query() call."""
        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        got = text_index.query_text(wh, "spark table window spark")
        want = text_index.query(wh, TERMS)
        assert _key(got) == _key(want)
        # and with top-k
        got_k = text_index.query_text(wh, "spark table window", k=3)
        want_k = text_index.query(wh, TERMS, k=3)
        assert _key(got_k) == _key(want_k)

    def test_analyzer_parity_includes_split_quirks(self, spark, tmp_path):
        """The contract is PARITY with the index-side tokenizer, quirks
        included: the index splits on single spaces, so a double space
        yields an empty-string term on BOTH sides — query_terms must
        reproduce it, not 'helpfully' normalize."""
        wh = Warehouse(spark, str(tmp_path / "ix"))
        docs = _docs(spark).unionByName(
            spark.createDataFrame(
                [Row(doc_id=9, text="gap  spark")]  # double space
            )
        )
        text_index.build(wh, docs, run_id=1)
        assert text_index.query_terms(wh, "gap  spark") == ["", "gap", "spark"]
        got = text_index.query_text(wh, "gap  spark")
        want = text_index.query(wh, ["", "gap", "spark"])
        assert _key(got) == _key(want)
        # the empty term matches doc 9's empty posting (parity, both sides)
        n9 = {r.doc_id: r.n_matched_terms for r in got.collect()}
        assert n9[9] == 3

    def test_empty_query_raises(self, spark, tmp_path):
        import pytest

        wh = Warehouse(spark, str(tmp_path / "ix"))
        text_index.build(wh, _docs(spark), run_id=1)
        with pytest.raises(ValueError, match="no terms"):
            text_index.query_text(wh, "")


class TestUnicodeContract:
    def test_nfd_query_matches_nfc_indexed_docs(self, spark, tmp_path):
        """The analyzer NFC-normalizes BOTH sides (text.nfc — the
        engine-wide contract): documents indexed with NFC 'café' must
        be found by an NFD-encoded query ('cafe' + combining acute),
        and the result is bit-identical to the NFC query."""
        import unicodedata

        from pyspark.sql import Row

        nfc_text = "the café review mentions spark"  # NFC é
        assert unicodedata.normalize("NFC", nfc_text) == nfc_text
        wh = Warehouse(spark, str(tmp_path / "ix"))
        docs = _docs(spark).unionByName(
            spark.createDataFrame([Row(doc_id=9, text=nfc_text)])
        )
        text_index.build(wh, docs, run_id=1)
        nfd_query = unicodedata.normalize("NFD", "café spark")
        assert nfd_query != "café spark"  # really byte-different
        got = text_index.query_text(wh, nfd_query)
        want = text_index.query_text(wh, "café spark")
        assert _key(got) == _key(want)
        matched = {r.doc_id: r.n_matched_terms for r in got.collect()}
        assert matched[9] == 2  # café AND spark both hit doc 9

    def test_nfd_indexed_doc_found_by_nfc_query(self, spark, tmp_path):
        """Normalization is document-side too: an NFD-encoded doc
        entering build/ingest lands in the index under its NFC terms."""
        import unicodedata

        from pyspark.sql import Row

        nfd_text = unicodedata.normalize(
            "NFD", "the café review mentions spark"
        )
        wh = Warehouse(spark, str(tmp_path / "ix"))
        docs = _docs(spark).unionByName(
            spark.createDataFrame([Row(doc_id=9, text=nfd_text)])
        )
        text_index.build(wh, docs, run_id=1)
        got = {
            r.doc_id: r.n_matched_terms
            for r in text_index.query_text(wh, "café").collect()
        }
        assert got == {9: 1}
