"""Unit tests for the training-data-pipeline operators on tiny
hand-built frames: dedup family, similarity search, text analysis,
multimodal plumbing, MLlib classifier."""

import math

import pytest
from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators import dedup, ml, similarity, text


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_groups_identical_texts(spark):
    d = docs_df(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    out = {r.canonical_id: r.n_copies for r in dedup.exact_dedup(d).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_drop_short_docs_and_dedupe(spark):
    d = docs_df(spark, [(1, "a b c d"), (2, "a b"), (3, "a b a b a b a b")])
    sh = dedup.shingles(d).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert 2 not in by_doc  # < 3 tokens
    assert by_doc[1] == {"a b c", "b c d"}
    assert by_doc[3] == {"a b a", "b a b"}  # distinct only


def test_ngram_jaccard_identical_and_disjoint(spark):
    d = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),  # identical -> jaccard 1.0
            (3, "completely different words here now"),
        ],
    )
    rows = dedup.ngram_jaccard_pairs(d, tau=0.5).collect()
    assert [(r.a, r.b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_minhash_lsh_finds_identical_pair(spark):
    # Identical docs share every minhash -> every band collides.
    d = docs_df(
        spark,
        [
            (1, "one two three four five six"),
            (2, "one two three four five six"),
            (3, "seven eight nine ten eleven twelve"),
        ],
    )
    rows = dedup.minhash_lsh_pairs(d, tau=0.9).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 2)]


def test_simhash_identical_docs_share_bucket(spark):
    d = docs_df(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zzz")])
    rows = {r.doc_id: r for r in dedup.simhash(d).collect()}
    assert rows[1].simhash == rows[2].simhash
    assert rows[1].bucket_size == 2 or rows[3].simhash == rows[1].simhash


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_orthogonal_and_parallel(spark):
    d = emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [2.0, 0.0])])
    pairs = {(r.a, r.b): r.cos for r in similarity.cosine_near_dup_pairs(d, tau=-1.0).collect()}
    assert math.isclose(pairs[(1, 3)], 1.0)
    assert math.isclose(pairs[(1, 2)], 0.0, abs_tol=1e-12)


def test_brute_force_topk_ranks_by_cosine(spark):
    d = emb_df(
        spark,
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.05])],
    )
    rows = similarity.brute_force_topk(d, k=2, query_pred="vec_id = 0").collect()
    assert [(r.rnk, r.cand_id) for r in rows] == [(1, 3), (2, 1)]


def test_lsh_ann_restricts_to_bucket(spark):
    # vec 2 lands in a different sign bucket (negative first coord).
    d = emb_df(
        spark,
        [(0, [1.0, 1.0]), (1, [0.5, 1.0]), (2, [-1.0, 1.0])],
    )
    rows = similarity.lsh_ann_topk(d, k=5, query_pred="vec_id = 0", n_bits=2).collect()
    assert {r.cand_id for r in rows} == {1}


def test_ivf_topk_searches_own_cell_only(spark):
    # Centroids = vecs 0 and 1 (n_centroids=2). Vec 2 joins cell 0
    # (parallel to vec 0), vec 3 joins cell 1. Query 0 must see only
    # cell-0 members.
    d = emb_df(
        spark,
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.1]), (3, [0.1, 3.0])],
    )
    rows = similarity.ivf_topk(d, k=5, n_centroids=2, query_pred="vec_id = 0").collect()
    assert {r.cand_id for r in rows} == {2}


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_text_stats_exact_counts(spark):
    d = spark.createDataFrame(
        [(1, "the cat, the hat!", "en")], "doc_id long, text string, lang string"
    )
    r = text.with_text_stats(d).first()
    assert r.n_tokens == 4
    assert r.n_chars_calc == 17
    assert r.n_punct == 2  # ',' and '!'
    assert math.isclose(r.stopword_ratio, 0.5)  # 'the' twice / 4


def test_lang_id_marker_votes(spark):
    d = spark.createDataFrame(
        [(1, "der hund und die katze", "de"), (2, "the dog and the cat", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.pred_lang for r in text.with_lang_id(d).collect()}
    assert out == {1: "de", 2: "en"}


def test_fingerprint_normalizes_whitespace_and_case(spark):
    d = spark.createDataFrame(
        [(1, "Hello  World", "en"), (2, "hello world", "en"), (3, "other", "en")],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: r for r in text.with_fingerprint(d).collect()}
    assert rows[1].fp == rows[2].fp
    assert rows[1].fp_bucket == rows[2].fp_bucket
    assert rows[3].fp != rows[1].fp


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_multimodal_features_opaque_payload_byte_exact(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    payload = bytes([255, 0, 255, 0, 9, 9])  # not a PNG: opaque path
    media = spark.createDataFrame(
        [(7, "bin", 4, 4, payload)], schema=MEDIA_SCHEMA
    ).coalesce(1)
    r = extract_media_features(media).first()
    assert r.n_bytes == 6
    assert (r.width, r.height) == (4, 4)
    assert (r.decoded_width, r.decoded_height) == (None, None)
    assert math.isclose(r.brightness, (255 + 0 + 255 + 0) / (4 * 255.0))


def test_multimodal_features_decode_real_pixels(spark):
    from etl_fraud_detection_spark.functions.png import encode_png
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    px = bytes(range(5 * 3 * 3))  # 5x3 RGB ramp
    payload = encode_png(5, 3, 3, px)
    # declared metadata lies (9x9) — decoded dims must win
    media = spark.createDataFrame(
        [(8, "png", 9, 9, payload)], schema=MEDIA_SCHEMA
    ).coalesce(1)
    r = extract_media_features(media).first()
    assert (r.decoded_width, r.decoded_height) == (5, 3)
    assert math.isclose(r.brightness, sum(px) / (len(px) * 255.0))


def test_resize_keeps_aspect_and_never_upscales(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    media = spark.createDataFrame(
        [(1, "png", 64, 32, b"xx"), (2, "png", 8, 8, b"yy")], schema=MEDIA_SCHEMA
    ).coalesce(1)
    rows = {r.media_id: r for r in resize_media(media, max_dim=16).collect()}
    assert (rows[1].new_width, rows[1].new_height) == (16, 8)  # scaled 1/4
    assert (rows[2].new_width, rows[2].new_height) == (8, 8)  # no upscale


def test_sample_frames_stride(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    payload = bytes(range(12))  # 3 frames of 4 bytes
    media = spark.createDataFrame(
        [(1, "vid", 0, 0, payload)], schema=MEDIA_SCHEMA
    ).coalesce(1)
    rows = sorted(
        sample_frames(media, frame_size=4, stride=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, bytes(r.frame)) for r in rows] == [
        (0, bytes([0, 1, 2, 3])),
        (2, bytes([8, 9, 10, 11])),
    ]


def test_near_dup_clusters_transitive(spark):
    # a~b and b~c but never a~c directly: one cluster rooted at min id.
    # The exact candidate generator makes edge recall deterministic —
    # LSH banding catches a jaccard-0.75 pair only probabilistically
    # (~68% at 3 bands x 4 rows), and this test pins label PROPAGATION,
    # not LSH recall (test_minhash_lsh_finds_identical_pair covers the
    # always-collide LSH case).
    d = docs_df(
        spark,
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w5"),   # identical to 1
            (3, "w1 w2 w3 w4 w5 w6"),  # near 1/2 (jaccard 3/4 < .8? -> use tau .5)
            (9, "zz yy xx ww vv"),
        ],
    )
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.near_dup_clusters(d, tau=0.5, candidates="exact").collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[9] == 9


def test_near_dup_clusters_deep_chain_converges(spark):
    """Pointer-doubling worst case: a pure CHAIN d0~d1~...~d9 (each doc
    shares enough shingles only with its neighbors) must still collapse
    to one cluster rooted at the minimum id — plain one-hop propagation
    would need ~10 rounds here; shortcutting must get the same answer
    (and the round loop must actually terminate)."""
    # overlapping 6-token windows over a 16-token sequence: consecutive
    # windows share 5 of 7 shingle-grams (jaccard > 0.5), windows two
    # apart share fewer (jaccard < 0.5) -> chain edges only
    toks = [f"t{i}" for i in range(16)]
    rows = [(i, " ".join(toks[i : i + 6])) for i in range(10)]
    d = docs_df(spark, rows)
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.near_dup_clusters(d, tau=0.4, candidates="exact").collect()
    }
    # sanity on the fixture: it IS a chain under this tau
    pairs = {
        (r.a, r.b)
        for r in dedup.ngram_jaccard_pairs(d, tau=0.4).select("a", "b").collect()
    }
    assert pairs == {(i, i + 1) for i in range(9)}, pairs
    assert all(out[i] == 0 for i in range(10)), out


# ---------------------------------------------------------------------------
# ml
# ---------------------------------------------------------------------------


def test_classifier_learns_separable_labels(spark):
    rows = [(i, [float(i % 2 * 2 - 1), 1.0], i % 2) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    model = ml.train_fraud_classifier(emb)
    scored = ml.score(model, emb)
    acc = scored.agg(
        F.avg((F.col("label") == F.col("prediction")).cast("double"))
    ).first()[0]
    assert acc == 1.0  # linearly separable by the first coordinate
    cm = {(r.label, r.prediction): r.n for r in ml.confusion_matrix(scored).collect()}
    assert cm == {(0, 0): 20, (1, 1): 20}


def test_repetition_removal_collapses_runs(spark):
    from etl_fraud_detection_spark.operators import text as T

    d = spark.createDataFrame(
        [
            (1, "a a a b b c"),          # runs collapse, order kept
            (2, "x y x y"),              # alternation untouched
            (3, "solo"),                 # single token unchanged
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.with_repetition_removal(d).collect()}
    assert rows[1].clean_text == "a b c"
    assert (rows[1].n_tokens_before, rows[1].n_tokens_after) == (6, 3)
    assert rows[2].clean_text == "x y x y"
    assert rows[3].clean_text == "solo" and rows[3].n_tokens_after == 1


def test_hll_portable_accuracy_and_stability(spark):
    """The portable HLL estimate must land within the m=256 error bound
    of the exact distinct count and be identical under repartitioning
    (order-free integer register sums)."""
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    d = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7919 % 2500).alias("k"),  # ~collisions: < 1000 distinct per g
    )
    exact = {
        r.g: r.n
        for r in d.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    est1 = {
        r.g: (r.hll_estimate, r.reg_sum_scaled)
        for r in sketches.hll_distinct(d, ["g"], "k").collect()
    }
    est2 = {
        r.g: (r.hll_estimate, r.reg_sum_scaled)
        for r in sketches.hll_distinct(d.repartition(13), ["g"], "k").collect()
    }
    assert est1 == est2  # digest + estimate independent of partitioning
    for g, n in exact.items():
        assert abs(est1[g][0] - n) / n < 0.25, (g, n, est1[g])
    # the rank/scale arithmetic must hold for EVERY p, not just the
    # default (the payload width varies with p)
    for p in (4, 6, 9):
        tol = 2.5 * 1.04 / (1 << p) ** 0.5 + 0.05  # ~2.5 sigma + lc slack
        for r in sketches.hll_distinct(d, ["g"], "k", p=p).collect():
            n = exact[r.g]
            assert abs(r.hll_estimate - n) / n < tol, (p, r.g, n, r.hll_estimate)


def test_hll_merge_equals_union_sketch(spark):
    """The mergeability contract: MAX-merging the register files of two
    overlapping corpora yields EXACTLY the union's register file (and
    therefore its digest/estimate) — per-shard sketches combine without
    rescanning."""
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    a = spark.range(0, 1500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(1000, 2500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    merged = sketches.hll_merge(
        sketches.hll_registers(a, ["g"], "k"),
        sketches.hll_registers(b, ["g"], "k"),
    )
    union = sketches.hll_registers(a.unionByName(b), ["g"], "k")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in union.collect()}
    est_m = sketches.hll_estimate_from_registers(merged, ["g"]).collect()[0]
    est_u = sketches.hll_estimate_from_registers(union, ["g"]).collect()[0]
    assert (est_m.reg_sum_scaled, est_m.hll_estimate) == (
        est_u.reg_sum_scaled, est_u.hll_estimate,
    )


def test_bloom_no_false_negatives_and_union_merge(spark):
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    keys_a = spark.range(0, 100, 7).select(F.col("id").alias("key"))
    big = spark.range(0, 500).select(F.col("id").alias("k"))
    pos = sketches.bloom_positions(keys_a, "key", m_bits=256, k=3)
    kept = {
        r.k
        for r in sketches.bloom_might_contain(
            big, "k", pos, m_bits=256, k=3
        ).collect()
    }
    member = set(range(0, 100, 7))
    assert member <= kept  # NO false negatives, ever
    assert kept != set(range(500))  # the filter actually filters

    # merge = distinct-union of position tables == filter of the union
    keys_b = spark.range(200, 300, 11).select(F.col("id").alias("key"))
    merged = pos.unionByName(
        sketches.bloom_positions(keys_b, "key", m_bits=256, k=3)
    ).distinct()
    direct = sketches.bloom_positions(
        keys_a.unionByName(keys_b), "key", m_bits=256, k=3
    )
    assert {r.pos for r in merged.collect()} == {r.pos for r in direct.collect()}


def test_bloom_false_positive_rate_tracks_theory(spark):
    """Parameter-dependent hardening: the empirical false-positive rate
    of the md5 double-hash Bloom filter must sit near the textbook
    (1 - e^(-kn/m))^k for more than one (m, k) geometry — a biased
    position family would pass the no-false-negative test yet blow the
    FPR. Deterministic inputs; the 3x-of-theory ceiling leaves room for
    double-hash correlation while still catching a broken hash mix."""
    import math

    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    members = spark.range(0, 200).select(F.col("id").alias("key"))
    # probe keys disjoint from members: any kept row is a false positive
    probes = spark.range(10_000, 14_000).select(F.col("id").alias("k"))
    for m_bits, k in ((2048, 3), (4096, 5)):
        pos = sketches.bloom_positions(members, "key", m_bits=m_bits, k=k)
        fp = sketches.bloom_might_contain(
            probes, "k", pos, m_bits=m_bits, k=k
        ).count()
        rate = fp / 4_000
        theory = (1.0 - math.exp(-k * 200 / m_bits)) ** k
        assert rate <= max(3.0 * theory, 0.01), (m_bits, k, rate, theory)


def test_hll_p_contract_blocks_mismatched_estimate(spark):
    """A register file carries its p; estimating (or merging then
    estimating) at a different p must raise rather than silently
    produce a wrong-geometry estimate."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from etl_fraud_detection_spark.operators import sketches

    d = spark.range(0, 500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    regs6 = sketches.hll_registers(d, ["g"], "k", p=6)
    with pytest.raises(Exception, match="p mismatch"):
        sketches.hll_estimate_from_registers(regs6, ["g"], p=8).collect()
    # out-of-range p rejected before any plan is built
    with pytest.raises(ValueError):
        sketches.hll_registers(d, ["g"], "k", p=12)
    with pytest.raises(ValueError):
        sketches.hll_estimate_from_registers(regs6, ["g"], p=3)
    # a file stripped of its p column cannot be merged
    with pytest.raises(ValueError, match="precision column"):
        sketches.hll_merge(regs6.drop("p"), regs6.drop("p"))
    # mixed-width merge keeps the files apart (grouped by p), and
    # estimating the mix at either p raises on the foreign rows
    regs8 = sketches.hll_registers(d, ["g"], "k", p=8)
    mixed = sketches.hll_merge(regs6, regs8)
    assert mixed.select("p").distinct().count() == 2
    with pytest.raises(Exception, match="p mismatch"):
        sketches.hll_estimate_from_registers(mixed, ["g"], p=6).collect()


def test_cms_never_undercounts_and_merges(spark):
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    # stream where key i appears i+1 times, i in 0..19
    rows = [(i,) for i in range(20) for _ in range(i + 1)]
    stream = spark.createDataFrame(rows, "key long")
    keys = spark.range(20).select(F.col("id").alias("key"))
    cms = sketches.cms_build(stream, "key", depth=4, width=64)
    est = {
        r.key: r.cms_count
        for r in sketches.cms_estimate(cms, keys, "key", depth=4, width=64).collect()
    }
    for i in range(20):
        assert est[i] >= i + 1  # never an undercount
    # absent key: estimate is collision noise only (>= 0, tiny here)
    absent = spark.createDataFrame([(999,)], "key long")
    (r,) = sketches.cms_estimate(cms, absent, "key", depth=4, width=64).collect()
    assert r.cms_count >= 0

    # merge(A, B) == build(A ++ B), cell for cell
    a, b = stream.where("key < 10"), stream.where("key >= 10")
    merged = sketches.cms_merge(
        sketches.cms_build(a, "key", depth=4, width=64),
        sketches.cms_build(b, "key", depth=4, width=64),
    )
    direct = sketches.cms_build(stream, "key", depth=4, width=64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_value_histogram_counts_and_edges(spark):
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.operators import sketches

    rows = [("a", float(v)) for v in range(0, 32)] + [("b", 5.0), ("b", 5.0)]
    d = spark.createDataFrame(rows, "g string, v double")
    out = sketches.value_histogram(d, "g", "v", bins=4)
    a = {r.bin: r.cnt for r in out.where("g = 'a'").collect()}
    assert a == {0: 8, 1: 8, 2: 8, 3: 8}  # 0..31 into 4 equal bins
    (b,) = out.where("g = 'b'").collect()
    assert (b.bin, b.cnt, b.lo, b.hi) == (0, 2, 5.0, 5.0)  # degenerate span
    total = sum(r.cnt for r in out.collect())
    assert total == len(rows)  # max value lands in the last bin, nothing lost


def test_ahash_scale_invariant_and_discriminative(spark):
    """2x nearest-neighbor upscale hashes identically (aligned sample
    grids); a different pattern hashes differently; opaque bytes are
    NULL."""
    from etl_fraud_detection_spark.functions.png import encode_png
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash_64,
        perceptual_hash,
    )

    base = [(x * 31 + y * 7) % 256 for y in range(8) for x in range(8)]
    up = [base[(y // 2) * 8 + (x // 2)] for y in range(16) for x in range(16)]
    assert ahash_64(8, 8, 1, bytes(base)) == ahash_64(16, 16, 1, bytes(up))

    other = bytes((x * 97 + y * 3) % 256 for y in range(8) for x in range(8))
    assert ahash_64(8, 8, 1, bytes(base)) != ahash_64(8, 8, 1, other)

    media = spark.createDataFrame(
        [
            (1, "png", 8, 8, encode_png(8, 8, 1, bytes(base))),
            (2, "png", 16, 16, encode_png(16, 16, 1, bytes(up))),
            (3, "bin", 0, 0, b"\xff\x00garbage"),
        ],
        schema=MEDIA_SCHEMA,
    ).coalesce(1)
    rows = {r.media_id: r.ahash for r in perceptual_hash(media).collect()}
    assert rows[1] == rows[2] and rows[1] is not None
    assert rows[3] is None


# ---------------------------------------------------------------------------
# substring-level exact dedup (any-alignment repeated spans)
# ---------------------------------------------------------------------------


def _tc(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_substring_dedup_boundary_straddling_repeat(spark):
    """The designed fixture from the round-8 verdict: a repeated
    k-token run placed so it STRADDLES two fixed 8-token segment
    boundaries. paragraph_dedup keeps both copies (no 8-aligned segment
    repeats); substring_dedup removes the later copy."""
    boiler = "all rights reserved contact us for terms of"  # 8 tokens
    # doc 0: boilerplate at offset 0 (aligned); doc 1: at offset 4 —
    # straddles the seg boundary between tokens 8 and 9
    d0 = boiler + " alpha beta gamma delta"
    d1 = "one two three four " + boiler + " epsilon zeta"
    docs = docs_df(spark, [(0, d0), (1, d1)])
    seg = _tc(dedup.paragraph_dedup(docs))
    assert seg[1]["n_kept"] == seg[1]["n_segments"]  # segment dedup misses it
    sub = _tc(dedup.substring_dedup(docs, k=8))
    assert sub[0]["n_removed"] == 0  # first occurrence keeps its text
    assert sub[1]["n_removed"] == 8
    assert sub[1]["text_clean"] == "one two three four epsilon zeta"


def test_substring_dedup_long_repeat_covered_at_every_alignment(spark):
    """A repeated span LONGER than k is fully removed (its L-k+1
    overlapping k-grams jointly cover all L tokens), and the remainder
    of the doc survives."""
    span = " ".join(f"w{i}" for i in range(12))  # 12-token repeat
    docs = docs_df(spark, [(0, span + " tail0 tail1"),
                           (1, "head0 " + span + " tail2")])
    got = _tc(dedup.substring_dedup(docs, k=8))
    assert got[0]["n_removed"] == 0
    assert got[1]["n_removed"] == 12
    assert got[1]["text_clean"] == "head0 tail2"


def test_substring_dedup_below_threshold_and_self_repeat(spark):
    """Spans shorter than k survive by contract; a repeat WITHIN one
    doc is removed at its second occurrence; short docs (< k tokens)
    pass through untouched."""
    short = "just a few tokens"
    rep = " ".join(f"r{i}" for i in range(8))
    docs = docs_df(spark, [(0, short),
                           (1, rep + " mid " + rep)])
    got = _tc(dedup.substring_dedup(docs, k=8))
    assert got[0]["n_removed"] == 0 and got[0]["text_clean"] == short
    assert got[1]["n_removed"] == 8
    assert got[1]["text_clean"] == rep + " mid"


def test_substring_dedup_hot_fingerprint_fixture(spark):
    """The round-10 skew fixture at correctness scale: ONE boilerplate
    8-gram repeated in EVERY doc (3 occurrences × 60 docs on one md5
    fingerprint — the crawl-boilerplate shape the agg+join rewrite
    exists for). Exactly one occurrence corpus-wide survives (doc 0,
    first position); every other occurrence is removed while each
    doc's unique filler survives untouched."""
    boiler = " ".join(f"b{i}" for i in range(8))
    docs = docs_df(
        spark,
        [
            (
                d,
                f"{boiler} u{d}a0 u{d}a1 u{d}a2 u{d}a3 u{d}a4 u{d}a5 "
                f"u{d}a6 u{d}a7 {boiler} u{d}b0 u{d}b1 u{d}b2 u{d}b3 "
                f"u{d}b4 u{d}b5 u{d}b6 u{d}b7 {boiler}",
            )
            for d in range(60)
        ],
    )
    got = _tc(dedup.substring_dedup(docs, k=8))
    # doc 0 keeps its first boilerplate copy, loses the other two
    assert got[0]["n_removed"] == 16
    assert got[0]["text_clean"].startswith(boiler + " u0a0")
    assert "b0" not in got[0]["text_clean"].split()[8:]
    for d in range(1, 60):
        assert got[d]["n_removed"] == 24, d  # all three copies removed
        assert got[d]["text_clean"] == (
            f"u{d}a0 u{d}a1 u{d}a2 u{d}a3 u{d}a4 u{d}a5 u{d}a6 u{d}a7 "
            f"u{d}b0 u{d}b1 u{d}b2 u{d}b3 u{d}b4 u{d}b5 u{d}b6 u{d}b7"
        ), d


def test_nfc_casefold_variant(spark):
    """text.nfc(casefold=True): NFC then casefold — the optional
    case-insensitive form of the normalization contract; the default
    stays case-sensitive."""
    import unicodedata

    rows = [(0, unicodedata.normalize("NFD", "Café")), (1, "CAFÉ"),
            (2, "plain ASCII Mixed")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n, r.cf)
        for r in df.select(
            "doc_id",
            text.nfc(F.col("text")).alias("n"),
            text.nfc(F.col("text"), casefold=True).alias("cf"),
        ).collect()
    }
    assert got[0] == ("Café", "café")
    assert got[1] == ("CAFÉ", "café")
    assert got[2] == ("plain ASCII Mixed", "plain ascii mixed")


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR importance weighting: a raw doc sharing the target domain's
    vocabulary must score a higher log-likelihood ratio than a
    disjoint-vocabulary raw doc; zero-feature docs surface with
    (n_feats=0, weight=0); n_feats counts unigrams + bigrams."""
    from etl_fraud_detection_spark.operators import sampling

    rows = [
        # target domain: medical-ish vocabulary
        (1, "patient dose trial dose patient outcome", 1),
        (2, "trial outcome dose patient trial dose", 1),
        # raw: one target-like, one disjoint, one empty
        (10, "patient dose outcome trial", 0),
        (11, "carburetor gasket torque flange", 0),
        (12, "", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_t int"
    )
    got = {
        r.doc_id: (r.n_feats, r.dsir_logw_micro)
        for r in sampling.dsir_weights(
            docs, F.col("is_t") == 1
        ).collect()
    }
    assert set(got) == {1, 2, 10, 11, 12}
    assert got[12] == (0, 0)
    # 4 tokens -> 4 unigrams + 3 bigrams
    assert got[10][0] == 7 and got[11][0] == 7
    assert got[10][1] > got[11][1]
    # target docs themselves score high (sanity: the model is not inverted)
    assert got[1][1] > got[11][1]


def test_survivor_aggregate_matches_window_form(spark):
    """Property pin for the round-11 skew hardening: the min-struct
    aggregate form of survivors_from_labels must be BIT-IDENTICAL to
    the retained row_number window form (largest size, min-id tie)
    on random label frames — size ties included, long AND string ids,
    plus a mega-cluster holding most of the corpus."""
    import random

    rng = random.Random(11)
    # sizes drawn from a tiny range so ties are common; cluster 0 is
    # the mega-cluster (the hot-key shape the rewrite exists for)
    rows = [
        (i, 0 if i % 4 else rng.randint(1, 12), rng.randint(1, 5))
        for i in range(500)
    ]
    labels = spark.createDataFrame(
        [(i, c) for i, c, _ in rows], "doc_id long, cluster_id long"
    )
    sized = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "doc_id long, n_chars long"
    )
    got = {
        r.cluster_id: (r.kept_id, r.kept_n_chars, r.n_members)
        for r in dedup.survivors_from_labels(
            labels, sized, "doc_id", "n_chars"
        ).collect()
    }
    want = {
        r.cluster_id: (r.kept_id, r.kept_n_chars, r.n_members)
        for r in dedup._survivors_from_labels_window(
            labels, sized, "doc_id", "n_chars"
        ).collect()
    }
    assert got == want and len(got) > 5

    # string ids: tie-break must be LEXICOGRAPHIC min, same as the
    # window's ORDER BY id ASC on a string column
    labels_s = spark.createDataFrame(
        [(f"m{i:02d}" if i % 3 else f"a{i}", i % 4)
         for i in range(60)],
        "media_id string, cluster_id long",
    )
    sized_s = spark.createDataFrame(
        [(f"m{i:02d}" if i % 3 else f"a{i}", rng.randint(1, 3))
         for i in range(60)],
        "media_id string, n_bytes long",
    )
    got_s = {
        r.cluster_id: (r.kept_id, r.kept_n_bytes, r.n_members)
        for r in dedup.survivors_from_labels(
            labels_s, sized_s, "media_id", "n_bytes"
        ).collect()
    }
    want_s = {
        r.cluster_id: (r.kept_id, r.kept_n_bytes, r.n_members)
        for r in dedup._survivors_from_labels_window(
            labels_s, sized_s, "media_id", "n_bytes"
        ).collect()
    }
    assert got_s == want_s

    # NULL sizes: the window's ORDER BY size DESC puts nulls LAST, so
    # a null-size member may only win an all-null cluster (then by min
    # id). The aggregate must agree — a raw min(struct(-size, id))
    # would sort the null key FIRST and crown the null member instead
    # (round-11 advice; fixed with a +Long.MAX sentinel). Cluster 0
    # mixes null and sized members, cluster 1 is all-null, cluster 2
    # has a null-size member with the smallest id.
    labels_n = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "doc_id long, cluster_id long"
    )
    sized_n = spark.createDataFrame(
        [(i, None if (i in (0, 2, 6) or i % 3 == 1) else i + 1)
         for i in range(12)],
        "doc_id long, n_chars long",
    )
    got_n = {
        r.cluster_id: (r.kept_id, r.kept_n_chars, r.n_members)
        for r in dedup.survivors_from_labels(
            labels_n, sized_n, "doc_id", "n_chars"
        ).collect()
    }
    want_n = {
        r.cluster_id: (r.kept_id, r.kept_n_chars, r.n_members)
        for r in dedup._survivors_from_labels_window(
            labels_n, sized_n, "doc_id", "n_chars"
        ).collect()
    }
    assert got_n == want_n
    assert got_n[1] == (1, None, 4)  # all-null cluster: min id, null size


def test_survivor_aggregate_is_window_free(spark):
    """The survivor plan must contain a partial (map-side combinable)
    aggregate and NO Window operator — the mega-cluster guarantee."""
    labels = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, cluster_id long"
    )
    sized = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_id long, n_chars long"
    )
    out = dedup.survivors_from_labels(labels, sized, "doc_id", "n_chars")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "partial" in p.lower()


def test_dsir_select_tilts_mix_toward_target(spark):
    """Closing the DSIR loop (weights -> Gumbel-top-k selection): on a
    corpus where half the raw docs share the target domain's
    vocabulary and half are disjoint, the selected set's domain mix
    must tilt decisively toward the target-like half (base rate 50%),
    and only RAW docs may ever be selected."""
    from etl_fraud_detection_spark.operators import sampling

    med = ["patient", "dose", "trial", "outcome", "clinic", "assay"]
    car = ["carburetor", "gasket", "torque", "flange", "piston", "valve"]

    def text(vocab, i):
        return " ".join(vocab[(i + j) % len(vocab)] for j in range(12))

    rows = (
        [(i, "src0", text(med, i)) for i in range(40)]
        + [(100 + i, "srcA", text(med, i + 3)) for i in range(60)]
        + [(200 + i, "srcB", text(car, i)) for i in range(60)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sel = sampling.dsir_select(docs, F.col("source") == "src0", k=50).collect()
    assert len(sel) == 50
    ids = [r.doc_id for r in sel]
    assert all(i >= 100 for i in ids)  # never selects target rows
    n_target_like = sum(1 for i in ids if i < 200)
    # base rate would put ~25 of 50 in srcA; the tilt must be decisive
    assert n_target_like >= 40, n_target_like
    # rows come back highest Gumbel-perturbed weight first
    keys = [r.es_key_micro for r in sel]
    assert keys == sorted(keys, reverse=True)


def test_pq_adc_exact_when_vectors_are_codebook_entries(spark):
    """PQ quantization error is zero when every candidate IS a codebook
    combination — then ADC == the exact inner product and the top-1
    neighbor of a codebook vector's own combination is itself-like.
    dim 8, m=4 subspaces of 2 dims, ksub=4 (ids 0..3)."""
    base = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0]),
        # candidates: exact combinations of the codebook subvectors
        (10, [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0]),  # c0|c1|c2|c0-ish
        (11, [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pq_adc_topk(
        emb, k=6, m=4, ksub=4, query_pred="vec_id < 2"
    ).collect()
    exact = {
        (q, c): sum(a * b for a, b in zip(dict(base)[q], dict(base)[c]))
        for q in (0, 1) for c in (10, 11)
    }
    got = {(r.query_id, r.cand_id): r.adc for r in out
           if r.cand_id >= 10}
    for key, val in got.items():
        assert val == pytest.approx(exact[key], abs=1e-12), key


def test_pq_adc_recall_vs_brute_force(spark):
    """On the real sf0.001 embeddings, default-parameter PQ-ADC top-5
    must beat the random floor (k/(N-1) ≈ 1%) by an order of magnitude.
    The absolute recall is modest BY DESIGN here: the embeddings are
    near-random (PQ's distortion worst case) and the oracle-checkable
    codebook is untrained — the exactness test above pins the math,
    this pins that the ranking carries real signal; production recall
    comes from passing trained `codebooks`."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    adc = similarity.pq_adc_topk(emb, k=5).collect()
    brute = similarity.brute_force_topk(emb, k=5).collect()
    top = {}
    for r in adc:
        top.setdefault(r.query_id, set()).add(r.cand_id)
    hits = total = 0
    for r in brute:
        total += 1
        hits += r.cand_id in top.get(r.query_id, set())
    assert total == 50
    assert hits / total >= 0.12, f"recall@5 {hits}/{total}"


def test_pq_trained_codebooks_reduce_distortion(spark):
    """The recall lever, pinned by the quantity it actually moves:
    Lloyd-trained subspace codebooks must have lower mean quantization
    error than the deterministic lowest-id codebook (on this fixture:
    ~0.18 vs ~0.26 subspace L2²). Top-5 overlap is NOT the right pin
    on near-random vectors — ranking noise swamps it."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = 4
    dsub = (F.size(F.col("embedding")) / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(F.col("embedding"), s * dsub + 1, dsub),
    )
    rows = emb.select(
        F.col("vec_id").alias("vid"), F.posexplode(subs).alias("sub", "xs")
    )

    def mse(cen):
        return (
            rows.join(F.broadcast(cen), "sub")
            .groupBy("vid", "sub")
            .agg(
                F.min(
                    F.struct(
                        similarity.l2sq(F.col("xs"), F.col("cs")).alias("d"),
                        F.col("cid"),
                    )
                ).alias("_m")
            )
            .agg(F.avg("_m.d"))
            .first()[0]
        )

    untrained = emb.where("vec_id < 16").select(
        F.col("vec_id").alias("cid"), F.posexplode(subs).alias("sub", "cs")
    )
    trained = similarity.pq_codebooks_kmeans(emb, m=m, ksub=16)
    assert mse(trained) < mse(untrained)
