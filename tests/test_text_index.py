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
