"""Unit tests for the corpus-curation operators (PII redaction, quality
gate, deterministic sampling, embedding normalization)."""

import math

from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import sampling, similarity, text


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redaction_all_kinds(spark):
    d = docs(
        spark,
        [
            (1, "mail me at bob.smith+x@corp.example.com today"),
            (2, "card 1234-5678-9012-3456 expires soon"),
            (3, "call 555-123-4567 or visit 192.168.0.1"),
            (4, "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in text.with_pii_redaction(d).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].redacted
    assert "bob" not in out[1].redacted
    assert out[2].n_cc == 1 and out[2].n_phone == 0  # card is NOT phone
    assert "<CC>" in out[2].redacted
    assert out[3].n_phone == 1 and out[3].n_ip == 1
    assert out[3].redacted == "call <PHONE> or visit <IP>"
    assert out[4].redacted == "nothing sensitive here"
    assert out[4].n_email == out[4].n_cc == out[4].n_phone == out[4].n_ip == 0


def test_pii_card_not_rematched_as_phone(spark):
    # The card tail "1111-1111-1111" contains a phone-shaped substring;
    # ordering (CC before PHONE) must prevent double redaction.
    d = docs(spark, [(1, "pay 4111-1111-1111-1111 now")])
    r = text.with_pii_redaction(d).collect()[0]
    assert r.n_cc == 1 and r.n_phone == 0
    assert r.redacted == "pay <CC> now"


def test_quality_filter_reasons(spark):
    d = docs(
        spark,
        [
            (1, "too short"),  # 2 tokens
            (2, "the " * 20 + "cat sat of a mat in is to and"),  # healthy
            (3, "a! b? c. d; e: f, g! h? i. j;"),  # punct heavy
        ],
    )
    out = {r.doc_id: r for r in text.with_quality_filter(d).collect()}
    assert not out[1].keep and "too_short" in out[1].drop_reasons
    assert out[2].keep and out[2].drop_reasons == ""
    assert not out[3].keep and "punct_heavy" in out[3].drop_reasons


def test_stratified_sample_deterministic_and_filtered(spark):
    d = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zz") for i in range(400)],
        "doc_id long, lang string",
    )
    out1 = sampling.stratified_sample(d, {"en": 50}, "lang", "doc_id", default_rate=0)
    out2 = sampling.stratified_sample(d, {"en": 50}, "lang", "doc_id", default_rate=0)
    ids1 = sorted(r.doc_id for r in out1.collect())
    assert ids1 == sorted(r.doc_id for r in out2.collect())  # reproducible
    assert all(i % 2 == 0 for i in ids1)  # zz stratum rate 0 -> dropped
    # ~50% of the 200 en docs, within a loose tolerance
    assert 60 <= len(ids1) <= 140


def test_hash_topk_sample_fixed_size(spark):
    d = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_topk_sample(d, k=17, key_col="doc_id")
    rows1 = sorted(r.doc_id for r in out.collect())
    rows2 = sorted(
        r.doc_id
        for r in sampling.hash_topk_sample(
            d.repartition(7), k=17, key_col="doc_id"
        ).collect()
    )
    assert len(rows1) == 17
    assert rows1 == rows2  # partitioning-independent


def test_epoch_shuffle_partition_independent(spark):
    d = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.shuffle_pos) for r in sampling.epoch_shuffle(d, "doc_id").collect()}
    b = {
        (r.doc_id, r.shuffle_pos)
        for r in sampling.epoch_shuffle(d.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert {p for _, p in a} == set(range(1, 201))  # a real permutation


def test_pack_sequences_capacity(spark):
    d = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id long, n_tok long"
    )
    out = sampling.pack_sequences(d, size_col="n_tok", key_col="doc_id", capacity=250)
    rows = sorted(out.collect(), key=lambda r: r.start_offset)
    assert [r.start_offset for r in rows] == [i * 100 for i in range(10)]
    # starts at 0,100,200 -> pack 0; 300,400 -> pack 1; ...
    assert [r.pack_id for r in rows] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_l2_normalize_zero_guard(spark):
    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r for r in similarity.l2_normalize_features(emb).collect()}
    assert math.isclose(out[1].l2_norm, 5.0)
    assert math.isclose(out[1].u0, 0.6)
    assert not out[1].is_zero
    assert out[2].is_zero and out[2].l2_norm == 0.0


def test_with_global_ntile_matches_window_ntile(spark):
    """Exact-ntile equivalence on awkward sizes (N % n != 0, N < n)."""
    from pyspark.sql import Window, functions as F

    for n_rows, tiles in [(12, 10), (5, 10), (200, 7), (64, 8)]:
        d = spark.range(n_rows).select(
            F.col("id").alias("k"), (F.col("id") * 37 % 11).alias("v")
        )
        got = {
            (r.k, r.bucket)
            for r in sampling.with_global_ntile(
                d.repartition(5), [F.col("v").asc(), F.col("k").asc()], tiles
            ).collect()
        }
        want = {
            (r.k, r.bucket)
            for r in d.select(
                "k",
                F.ntile(tiles)
                .over(Window.orderBy(F.col("v").asc(), F.col("k").asc()))
                .alias("bucket"),
            ).collect()
        }
        assert got == want, (n_rows, tiles)


def test_with_global_cumsum_matches_window(spark):
    from pyspark.sql import Window, functions as F

    d = spark.range(123).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    got = {
        (r.k, r.cum)
        for r in sampling.with_global_cumsum(
            d.repartition(9), [F.col("k").asc()], F.col("w"), "cum"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.cum)
        for r in d.select("k", F.sum("w").over(w).cast("long").alias("cum")).collect()
    }
    assert got == want


def test_global_rank_edge_cases(spark):
    """Empty and single-row inputs through every global-order helper."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame([], "doc_id long, n long")
    key = [F.col("doc_id").asc()]
    assert sampling.with_global_rank(e, key).count() == 0
    assert sampling.with_global_ntile(e, key, 10).count() == 0
    assert sampling.with_global_cumsum(e, key, F.col("n"), "c").count() == 0

    s = spark.createDataFrame([(7, 3)], "doc_id long, n long")
    (r,) = sampling.with_global_rank(s, key).collect()
    assert r.rn == 1
    (r,) = sampling.with_global_ntile(s, key, 10).collect()
    assert r.bucket == 1
    (r,) = sampling.with_global_cumsum(s, key, F.col("n"), "c").collect()
    assert r.c == 3
    sampling.release_ranked()


def test_pack_ffd_no_split_capacity_and_determinism(spark):
    """FFD packing: every doc whole in one pack, per-pack total <=
    capacity (oversized docs alone in theirs), and byte-identical
    across runs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = sampling.pack_sequences_ffd(
        docs, size_col="n_chars", key_col="doc_id", capacity=4096
    )
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r.n_chars)
    for sizes in by_pack.values():
        assert sum(sizes) <= 4096 or len(sizes) == 1  # oversized -> alone
    again = sampling.pack_sequences_ffd(
        docs, size_col="n_chars", key_col="doc_id", capacity=4096
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_ffd_waste_is_bounded(spark):
    """Fill ratio = Σsize / (packs x capacity) must stay near-optimal
    (FFD classical guarantee); on the real corpus it lands well above
    the 0.7 floor asserted here."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars"
    )
    # shards=4 so each shard holds many packs: at the 500-doc test SF
    # the default 64 shards leave ~1 under-filled pack per shard, which
    # measures shard granularity, not the packing
    out = sampling.pack_sequences_ffd(
        docs, size_col="n_chars", key_col="doc_id", capacity=4096, shards=4
    )
    from pyspark.sql import functions as F2

    agg = out.agg(
        F2.sum("n_chars").alias("tok"),
        F2.countDistinct("pack_id").alias("packs"),
    ).first()
    assert agg.tok / (agg.packs * 4096) >= 0.7


def test_vocab_coverage_curve(spark):
    """Top-k tokens with exact cumulative coverage: 'a' appears 6x,
    'b' 3x, 'c' 1x -> ranks 1/2/3, cum 6/9/10, ppm 600000/900000/1000000."""
    from etl_fraud_detection_spark.operators import corpus

    d = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c"), (3, "a a b")],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in corpus.vocab_coverage(d, k=2).collect()}
    assert set(rows) == {"a", "b"}  # k=2 truncates the curve
    assert (rows["a"].rank, rows["a"].cnt, rows["a"].cum_cnt,
            rows["a"].coverage_ppm) == (1, 6, 6, 600000)
    assert (rows["b"].rank, rows["b"].cnt, rows["b"].cum_cnt,
            rows["b"].coverage_ppm) == (2, 3, 9, 900000)
