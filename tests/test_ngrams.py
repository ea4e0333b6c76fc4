"""N-gram corpus hygiene operators: crafted-input correctness plus the
physical-plan properties that make them scale (map-only chunking and
diversity, broadcast decontamination join, doc-keyed repetition
shuffle)."""

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import ngrams, sampling
from etl_fraud_detection_spark.plans.queries import QUERIES

from test_plans import plan_of  # noqa: E402  (shared helpers)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_array_short_doc_guard(spark):
    # Spark sequence(1, stop<1) is DESCENDING, not empty — the guard must
    # short-circuit docs shorter than n to an empty gram array.
    out = (
        _docs(spark, [(1, "a b"), (2, "a b c d")])
        .select("doc_id", F.size(ngrams.ngram_array(n=4)).alias("n"))
        .collect()
    )
    got = {r.doc_id: r.n for r in out}
    assert got == {1: 0, 2: 1}


def test_repetition_stats_crafted(spark):
    out = ngrams.with_repetition_stats(
        _docs(spark, [(1, "a a a a"), (2, "x y z w")])
    ).collect()
    by_id = {r.doc_id: r for r in out}
    r1 = by_id[1]  # grams: "a a" x3
    assert (r1.n_grams, r1.n_distinct_grams, r1.top_gram_count) == (3, 1, 3)
    assert abs(r1.dup_gram_frac - 2 / 3) < 1e-15
    assert r1.top_gram_frac == 1.0
    r2 = by_id[2]  # all grams distinct
    assert r2.dup_gram_frac == 0.0 and r2.top_gram_frac == 1 / 3


def test_contamination_crafted(spark):
    train = _docs(spark, [(1, "p q r s t"), (2, "no overlap here at all")])
    bench = _docs(spark, [(100, "z z p q r s")])
    out = ngrams.contamination_check(train, bench, n=4).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.doc_id, row.n_shared_grams, row.n_bench_docs) == (1, 1, 1)


def test_chunking_covers_every_token(spark):
    chunks = QUERIES["q_chunk_docs"].fn(spark, SF_DIR)
    cover = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_chunk_tokens") - 1).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    )
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_tok = src.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    joined = cover.join(n_tok, "doc_id")
    assert joined.where(F.col("covered") != F.col("n")).count() == 0
    assert joined.where(F.col("max_idx") != F.col("n_chunks") - 1).count() == 0


def test_lexical_diversity_crafted(spark):
    out = ngrams.with_lexical_diversity(_docs(spark, [(1, "ab ab")]).withColumn(
        "text", F.col("text")
    )).collect()[0]
    # tokens: [ab, ab] -> 1 type / 2; chars: a,b,' ',a,b -> counts 2,2,1
    assert (out.n_token_types, out.n_tokens) == (1, 2)
    assert out.type_token_ratio == 0.5
    assert out.n_char_types == 3
    assert out.char_sq_sum == 2 * 2 + 2 * 2 + 1
    assert out.char_collision_prob == 9 / 25


def test_domain_mix_budget_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    out = sampling.domain_mix_sample(
        docs, {"src0": 2000}, "source", "n_chars", "doc_id", default_budget=800
    )
    rows = out.collect()
    # every kept doc starts strictly inside its domain budget
    assert all(r.tokens_before < r.budget for r in rows)
    # deterministic: re-running selects the identical doc set
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id
        for r in sampling.domain_mix_sample(
            docs, {"src0": 2000}, "source", "n_chars", "doc_id", default_budget=800
        ).collect()
    )
    # at least one domain actually truncated (budget < domain total)
    kept_src0 = [r for r in rows if r.source == "src0"]
    total_src0 = docs.where(F.col("source") == "src0").agg(
        F.sum("n_chars")
    ).collect()[0][0]
    assert 0 < len(kept_src0) and sum(r.n_chars for r in kept_src0) < total_src0 + 2000


def test_chunk_and_diversity_plans_are_map_only(spark):
    for name in ("q_chunk_docs", "q_lexical_diversity"):
        p = plan_of(QUERIES[name].fn(spark, SF_DIR))
        assert "Exchange" not in p, f"{name} should be shuffle-free"
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_contamination_broadcasts_benchmark_side(spark):
    p = plan_of(QUERIES["q_contamination"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_domain_mix_two_level_cumsum_equals_single_window(spark):
    """The round-10 salted two-level running total (local cumsum per
    (domain, md5-prefix bucket) + broadcast per-domain offsets) must be
    BIT-IDENTICAL to the naive single window partitioned by domain —
    ordering by (prefix, key) IS ordering by key. Random sizes, both
    skewed (one giant domain) and uniform."""
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [(i, "big" if i % 5 else f"s{i % 3}", rng.randint(1, 500))
            for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    budgets = {"big": 9000, "s0": 1500}
    got = {
        r.doc_id: (r.tokens_before, r.budget)
        for r in sampling.domain_mix_sample(
            docs, budgets, "source", "n_chars", "doc_id",
            default_budget=700,
        ).collect()
    }
    # naive reference: one window per domain over the full hash order
    key = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source").orderBy(key.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bud = (
        F.when(F.col("source") == "big", F.lit(9000))
        .when(F.col("source") == "s0", F.lit(1500))
        .otherwise(F.lit(700)).cast("long")
    )
    want = {
        r.doc_id: (r.tb, r.budget)
        for r in docs.select(
            "doc_id",
            (F.sum("n_chars").over(w) - F.col("n_chars"))
            .cast("long").alias("tb"),
            bud.alias("budget"),
        ).where(F.col("tb") < F.col("budget")).collect()
    }
    assert got == want
