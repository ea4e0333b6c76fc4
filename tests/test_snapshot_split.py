"""Round-6 curation additions: cluster survivor selection, holdout
split, snapshot diff (operators/dedup.cluster_survivors,
sampling.holdout_split, snapshot.snapshot_diff)."""

import pytest
from pyspark.sql import Row, functions as F

from etl_fraud_detection_spark.operators import dedup, sampling, snapshot


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, n_chars=len(t)) for i, t in rows]
    )


class TestClusterSurvivors:
    def test_keeps_largest_per_cluster(self, spark):
        # 1<->2 near-dup (2 longer), 3 singleton
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base),
            (2, base + " with an extra trailing clause"),
            (3, "completely different content about distributed query engines"),
        ]
        out = dedup.cluster_survivors(_docs(spark, rows), tau=0.5)
        got = {r["cluster_id"]: r for r in out.collect()}
        assert got[1]["kept_id"] == 2  # longest wins
        assert got[1]["n_members"] == 2
        assert got[3]["kept_id"] == 3 and got[3]["n_members"] == 1

    def test_tie_breaks_on_min_id(self, spark):
        t = "identical size text payload for the deterministic tie break case"
        out = dedup.cluster_survivors(
            _docs(spark, [(10, t), (7, t)]), tau=0.5
        )
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["kept_id"] == 7

    def test_survivor_count_equals_cluster_count(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(i, base + f" tail{i % 2}") for i in range(6)] + [
            (100, "unrelated standalone document text with nothing shared here at all")
        ]
        docs = _docs(spark, rows)
        n_clusters = (
            dedup.near_dup_clusters(docs, tau=0.5)
            .select("cluster_id").distinct().count()
        )
        assert dedup.cluster_survivors(docs, tau=0.5).count() == n_clusters


class TestHoldoutSplit:
    def test_deterministic_and_exhaustive(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        out = sampling.holdout_split(df, "doc_id")
        a = {r["doc_id"]: (r["bucket"], r["split"]) for r in out.collect()}
        b = {r["doc_id"]: (r["bucket"], r["split"]) for r in out.collect()}
        assert a == b  # stable across executions
        assert set(s for _, s in a.values()) == {"train", "val", "test"}
        # split follows the bucket ranges exactly
        for bucket, split in a.values():
            want = "train" if bucket < 90 else ("val" if bucket < 95 else "test")
            assert split == want

    def test_fractions_roughly_hold(self, spark):
        df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        counts = dict(
            sampling.holdout_split(df, "doc_id")
            .groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
        )
        assert abs(counts["train"] / 5000 - 0.90) < 0.03
        assert abs(counts["val"] / 5000 - 0.05) < 0.02
        assert abs(counts["test"] / 5000 - 0.05) < 0.02

    def test_bad_widths_raise(self, spark):
        df = spark.range(3).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            sampling.holdout_split(df, "doc_id", splits=(("a", 50), ("b", 20)))

    def test_no_shuffle_in_plan(self, spark):
        df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        plan = sampling.holdout_split(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSnapshotDiff:
    def test_classifies_all_three(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )
        new = spark.createDataFrame(
            [Row(k=2, v="b"), Row(k=3, v="C"), Row(k=4, v="d")]
        )
        got = {
            r["k"]: r["status"]
            for r in snapshot.snapshot_diff(old, new, "k", ["v"]).collect()
        }
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_unchanged_rows_dropped(self, spark):
        df = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(20)])
        assert snapshot.snapshot_diff(df, df, "k", ["v"]).count() == 0

    def test_multi_column_digest_order_sensitive(self, spark):
        old = spark.createDataFrame([Row(k=1, a="x", b="y")])
        new = spark.createDataFrame([Row(k=1, a="y", b="x")])
        out = snapshot.snapshot_diff(old, new, "k", ["a", "b"]).collect()
        assert [r["status"] for r in out] == ["changed"]

    def test_null_vs_value_is_changed(self, spark):
        old = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v="s")])
        new = spark.createDataFrame([Row(k=1, v="s"), Row(k=2, v="s")])
        got = {
            r["k"]: r["status"]
            for r in snapshot.snapshot_diff(old, new, "k", ["v"]).collect()
        }
        assert got == {1: "changed"}

    def test_null_position_swap_is_changed(self, spark):
        """(NULL,'x') -> ('x',NULL) must classify as changed: NULLs are
        encoded with explicit markers, so which column holds the value
        is part of the digest (concat_ws alone would collapse both
        rows to the same string by skipping the NULL)."""
        old = spark.createDataFrame(
            [(1, None, "x")], "k long, a string, b string"
        )
        new = spark.createDataFrame(
            [(1, "x", None)], "k long, a string, b string"
        )
        out = snapshot.snapshot_diff(old, new, "k", ["a", "b"]).collect()
        assert [r["status"] for r in out] == ["changed"]


class TestBandedExactCollapse:
    """collapse_exact must be a pure optimization: identical pair set
    AND identical cosine values vs per-pair evaluation, on a corpus
    where exact-duplicate multiplicity dominates."""

    def _emb(self, spark):
        import random

        rnd = random.Random(7)
        rows = []
        vid = 0
        for g in range(12):  # 12 distinct vectors, varying copy counts
            vec = [rnd.uniform(-1, 1) for _ in range(48)]
            for _ in range(1 + g % 4):
                rows.append((vid, vec))
                vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_collapse_matches_per_pair(self, spark):
        from etl_fraud_detection_spark.operators import similarity

        emb = self._emb(spark)
        kw = dict(tau=0.2, bands=4, band_bits=6)
        fast = similarity.cosine_near_dup_pairs_banded(
            emb, collapse_exact=True, **kw
        )
        slow = similarity.cosine_near_dup_pairs_banded(
            emb, collapse_exact=False, **kw
        )
        k_fast = sorted(tuple(r) for r in fast.collect())
        k_slow = sorted(tuple(r) for r in slow.collect())
        assert k_fast == k_slow
        assert len(k_fast) > 0  # duplicates guarantee within-group pairs

    def test_collapse_matches_per_pair_lsh(self, spark):
        from etl_fraud_detection_spark.operators import similarity

        emb = self._emb(spark)
        fast = similarity.cosine_near_dup_pairs_lsh(
            emb, tau=0.2, n_bits=6, collapse_exact=True
        )
        slow = similarity.cosine_near_dup_pairs_lsh(
            emb, tau=0.2, n_bits=6, collapse_exact=False
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )


class TestTextExactCollapse:
    """Text twin of the embedding collapse: minhash_lsh_pairs with
    collapse_exact must emit the identical pair set and jaccard values
    as per-pair evaluation, on a corpus where whole documents repeat
    byte-identically — including a short-doc dup group that shingles
    to nothing and must yield NO pairs in both plans."""

    def _docs(self, spark):
        a = "the quick brown fox jumps over the lazy dog in the morning sun"
        b = "a completely different text about distributed dataframe engines at scale"
        c = a + " with a small trailing edit for near dup structure"
        rows = (
            [(i, a) for i in range(3)]            # exact-dup group of 3
            + [(10 + i, b) for i in range(2)]     # exact-dup group of 2
            + [(20, c)]                           # near-dup of group a
            + [(30, "too short")]                 # sub-NGRAM dup group
            + [(31, "too short")]
        )
        return spark.createDataFrame(
            [(i, t, len(t)) for i, t in rows],
            "doc_id long, text string, n_chars long",
        )

    def test_collapse_matches_per_pair(self, spark):
        docs = self._docs(spark)
        fast = dedup.minhash_lsh_pairs(docs, tau=0.5, collapse_exact=True)
        slow = dedup.minhash_lsh_pairs(docs, tau=0.5, collapse_exact=False)
        k_fast = sorted(tuple(r) for r in fast.collect())
        k_slow = sorted(tuple(r) for r in slow.collect())
        assert k_fast == k_slow
        ids_in_pairs = {x for r in k_fast for x in (r[0], r[1])}
        assert 30 not in ids_in_pairs and 31 not in ids_in_pairs
        assert len(k_fast) >= 3  # the 3-copy group alone yields 3 pairs

    def test_clusters_and_survivors_unchanged(self, spark):
        docs = self._docs(spark)
        cl = dedup.near_dup_clusters(docs, tau=0.5)
        got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
        # copies + the near-dup all collapse to min id 0; group b to 10
        assert got[0] == got[1] == got[2] == got[20] == 0
        assert got[10] == got[11] == 10
        assert got[30] == 30 and got[31] == 31  # unshingled: singletons
        surv = {r["cluster_id"]: r for r in
                dedup.cluster_survivors(docs, tau=0.5).collect()}
        assert surv[0]["kept_id"] == 20  # the near-dup is the longest
        assert surv[0]["n_members"] == 4


class TestHammingNearDup:
    def test_finds_designed_pair_and_guard(self, spark):
        from etl_fraud_detection_spark.operators import multimodal
        import pytest as _pytest

        rows = [
            (1, 0b1010),                  # near dup of 2 (dist 1)
            (2, 0b1011),
            (3, (1 << 63) - 1),           # far from everything
            (4, None),                    # undecodable: excluded
            (5, -(1 << 63) + 5),          # negative hash (bit 63 set)
            (6, -(1 << 63) + 4),          # dist 1 from 5, crosses sign band
        ]
        df = spark.createDataFrame(rows, "media_id long, ahash long")
        got = {
            (r["a"], r["b"]): r["dist"]
            for r in multimodal.hamming_near_dup_pairs(df, max_dist=3).collect()
        }
        assert got == {(1, 2): 1, (5, 6): 1}
        with _pytest.raises(ValueError):
            multimodal.hamming_near_dup_pairs(df, max_dist=5, bands=4)

    def test_full_recall_within_bound(self, spark):
        """Pigeonhole: EVERY pair at distance <= bands-1 must be found
        — flip up to 3 random-ish bit positions and assert presence."""
        from etl_fraud_detection_spark.operators import multimodal

        base = 0x5A5A_1234_ABCD_0F0F
        rows = [(0, base)]
        want = set()
        flips = [(1, [0]), (2, [17, 40]), (3, [5, 33, 63])]
        for mid, bits in flips:
            v = base
            for b in bits:
                v ^= 1 << b
            # to signed 64-bit
            if v >= 1 << 63:
                v -= 1 << 64
            rows.append((mid, v))
            want.add((0, mid))
        df = spark.createDataFrame(rows, "media_id long, ahash long")
        got = {
            (r["a"], r["b"])
            for r in multimodal.hamming_near_dup_pairs(df, max_dist=3).collect()
        }
        assert want <= got

    def test_exact_collapse_pair_set_unchanged(self, spark):
        """Duplicate-saturated corpus: every hash present in several
        copies. The collapsed plan (default) must emit the EXACT pair
        set of the uncollapsed plan — within-group dist 0, cross-group
        the representative distance."""
        from etl_fraud_detection_spark.operators import multimodal

        base = 0x5A5A_1234_ABCD_0F0F
        rows = []
        for g, h in ((0, base), (1, base ^ (1 << 7)), (2, ~base)):
            for c in range(3):  # 3 hash-identical copies per group
                rows.append((g * 10 + c, h if h < 1 << 63 else h - (1 << 64)))
        rows.append((99, None))  # undecodable: excluded in both plans
        df = spark.createDataFrame(rows, "media_id long, ahash long")
        kw = dict(max_dist=3, bands=4)
        fast = {
            (r["a"], r["b"]): r["dist"]
            for r in multimodal.hamming_near_dup_pairs(df, **kw).collect()
        }
        slow = {
            (r["a"], r["b"]): r["dist"]
            for r in multimodal.hamming_near_dup_pairs(
                df, collapse_exact=False, **kw
            ).collect()
        }
        assert fast == slow
        # groups 0/1 are dist-1 near-dups: all 6x within + 9 cross pairs
        assert sum(1 for d in fast.values() if d == 0) == 9
        assert sum(1 for d in fast.values() if d == 1) == 9


class TestAudioFingerprint:
    def test_ehash_scale_invariant_and_edits_local(self):
        from etl_fraud_detection_spark.operators.multimodal import ehash_16

        base = [((i * 31) % 120 - 60) * 100 for i in range(64)]
        h = ehash_16(base)
        assert ehash_16([s * 3 for s in base]) == h  # amplitude rescale
        assert ehash_16([-s for s in base]) == h     # polarity flip
        edited = list(base)
        edited[5] += 5000
        d = bin(h ^ ehash_16(edited)).count("1")
        assert d <= 4  # a local edit flips few bits
        assert ehash_16([]) == 0

    def test_operator_pairs_audio_twins(self, spark):
        from etl_fraud_detection_spark.operators.multimodal import (
            audio_fingerprint, hamming_near_dup_pairs,
        )
        from etl_fraud_detection_spark.functions import wav

        base = [((i * 37) % 200 - 100) * 80 for i in range(50)]
        twin = [s * 2 for s in base]  # rescaled copy: identical hash
        other = [((i * 91) % 300 - 150) * 70 for i in range(50)]
        rows = [
            (1, wav.encode_wav(8000, 1, base)),
            (2, wav.encode_wav(8000, 1, twin)),
            (3, wav.encode_wav(8000, 1, other)),
            (4, b"not audio at all"),
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            (r["a"], r["b"]): r["dist"]
            for r in hamming_near_dup_pairs(
                audio_fingerprint(media), hash_col="ehash", hash_bits=16
            ).collect()
        }
        assert got.get((1, 2)) == 0
        assert (1, 4) not in got and (2, 4) not in got


class TestVideoNearDup:
    def test_shared_frame_pairs_and_corrupt_silent(self, spark):
        from etl_fraud_detection_spark.functions import jpeg
        from etl_fraud_detection_spark.operators.multimodal import (
            MEDIA_SCHEMA, video_frame_hashes, video_near_dup_pairs,
        )

        def frame(seed):
            # wrap-heavy pattern so distinct seeds hash distinctly
            px = bytes((x * 29 + y * 57 + seed * 83) % 256
                       for y in range(10) for x in range(12))
            return jpeg.encode_jpeg(12, 10, 1, px)

        clips = [
            (1, b"".join(frame(s) for s in (0, 1, 2))),
            (2, b"".join(frame(s) for s in (2, 3))),      # shares frame 2
            (3, b"".join(frame(s) for s in (7, 8))),      # disjoint
            (4, b"\xff\xd8nonsense\xff\xd9"),             # corrupt
        ]
        media = spark.createDataFrame(
            [(mid, "mjpeg", 12, 10, p) for mid, p in clips], MEDIA_SCHEMA
        )
        fh = video_frame_hashes(media)
        assert fh.where("media_id = 4").count() == 0
        got = {
            (r["a"], r["b"]): r["n_shared_frames"]
            for r in video_near_dup_pairs(fh).collect()
        }
        assert got == {(1, 2): 1}


class TestMediaClusterSurvivors:
    """Cross-modality survivor selection: image twins, rescaled audio,
    and shared-frame videos all collapse through the same connected
    components + keep-largest machinery as text."""

    def _media(self, spark):
        from etl_fraud_detection_spark.functions import jpeg, png, wav

        def img(seed, w=12, h=10, bump=None):
            px = bytearray((x * 29 + y * 57 + seed * 83) % 256
                           for y in range(h) for x in range(w))
            if bump is not None:
                px[bump] = (px[bump] + 40) % 256
            return png.encode_png(w, h, 1, bytes(px))

        def frame(seed):
            px = bytes((x * 29 + y * 57 + seed * 83) % 256
                       for y in range(10) for x in range(12))
            return jpeg.encode_jpeg(12, 10, 1, px)

        base_audio = [((i * 37) % 200 - 100) * 80 for i in range(50)]
        rows = [
            (1, "png", 12, 10, img(0)),
            (2, "png", 12, 10, img(0, bump=17)),         # near-dup of 1
            (3, "png", 12, 10, img(5)),                  # distinct image
            (10, "wav", 0, 0, wav.encode_wav(8000, 1, base_audio)),
            (11, "wav", 0, 0,
             wav.encode_wav(8000, 1, [s * 2 for s in base_audio])),  # rescale of 10
            (20, "mjpeg", 12, 10, frame(20) + frame(21) + frame(22)),
            (21, "mjpeg", 12, 10, frame(22) + frame(30)),  # shares frame 22
            (30, "bin", 0, 0, b"opaque payload, never pairs"),
        ]
        from etl_fraud_detection_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA), rows

    def test_all_three_modalities_cluster_and_keep_largest(self, spark):
        from etl_fraud_detection_spark.operators import multimodal

        media, rows = self._media(spark)
        size = {mid: len(p) for mid, _f, _w, _h, p in rows}
        got = {
            r["cluster_id"]: (r["kept_id"], r["kept_n_bytes"], r["n_members"])
            for r in multimodal.media_cluster_survivors(media).collect()
        }
        # image twins cluster under min id 1; audio under 10; video
        # under 20 (assuming the mjpeg clips don't image-pair with the
        # stills: different content); opaque + distinct stay singleton
        img_kept = 1 if size[1] >= size[2] else 2
        assert got[1] == (img_kept, size[img_kept], 2)
        aud_kept = 10 if size[10] >= size[11] else 11
        assert got[10] == (aud_kept, size[aud_kept], 2)
        assert got[20][2] == 2      # both clips in one cluster
        assert got[3] == (3, size[3], 1)
        assert got[30] == (30, size[30], 1)
        # every media id appears in exactly one cluster
        assert sum(v[2] for v in got.values()) == len(rows)
