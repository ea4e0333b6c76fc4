"""BPE tokenizer: deterministic training, merge-replay encoding, and
the distributed encoder's equivalence to the driver-side reference."""

from etl_fraud_detection_spark.operators import bpe


def test_train_learns_frequent_pairs_deterministically():
    # 'ab' appears in every word and must merge first; ties then break
    # lexicographically, so repeated training is bit-identical.
    corpus = ["abab abc", "abd abab"]
    m1 = bpe.train_bpe(corpus, 3)
    m2 = bpe.train_bpe(corpus, 3)
    assert m1 == m2
    assert m1[0] == ("a", "b")


def test_encode_replays_merges_in_order():
    merges = [("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r"), ("er", "</w>")]
    assert bpe.encode_word("low", merges) == ["low</w>"]
    assert bpe.encode_word("lower", merges) == ["low", "er</w>"]
    assert bpe.encode_word("lowest", merges) == ["low", "e", "s", "t", "</w>"]
    assert bpe.encode_text("er lo", merges) == ["er</w>", "lo", "</w>"]
    assert bpe.encode_text("", merges) == []


def test_trained_encoder_compresses_training_words():
    corpus = ["the quick the lazy the end"] * 3
    merges = bpe.train_bpe(corpus, 8)
    # 'the' is the most frequent word: it must end up a single token
    assert bpe.encode_word("the", merges) == ["the</w>"]
    # unseen words still round-trip to characters + marker
    assert "".join(bpe.encode_word("zq", merges)) == "zq</w>"


def test_distributed_encode_matches_driver_reference(spark):
    docs_pdf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sample = [r.text for r in docs_pdf.limit(50).collect()]
    merges = bpe.train_bpe(sample, 20)
    out = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in bpe.encode_documents(docs_pdf.limit(50), merges).collect()
    }
    for r in docs_pdf.limit(50).collect():
        want = bpe.encode_text(r.text, merges)
        assert out[r.doc_id] == (want, len(want))


def test_decode_inverts_encode_for_any_merge_table(spark):
    from etl_fraud_detection_spark.operators import bpe

    texts = [
        "low lower lowest",
        "  spaced   out\ttabs and  runs ",
        "solo",
        "",
        "repeat repeat repeat repeat",
    ]
    merges = bpe.train_bpe(texts, n_merges=12)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.decoded
        for r in bpe.encode_documents(docs, merges)
        .select("doc_id", bpe.decode_tokens().alias("decoded"))
        .collect()
    }
    want = {i: " ".join(t.split()) for i, t in enumerate(texts)}
    assert got == want
    # and with NO merges at all (pure character segmentation)
    got0 = {
        r.doc_id: r.decoded
        for r in bpe.encode_documents(docs, [])
        .select("doc_id", bpe.decode_tokens().alias("decoded"))
        .collect()
    }
    assert got0 == want


def test_marker_bearing_input_is_quarantined_not_corrupted(spark):
    """Text containing the literal terminal marker '</w>' cannot
    round-trip (decode would read it as a word boundary). Default mode
    quarantines ONLY the offending doc (NULL tokens/count) so one bad
    doc never aborts the corpus-wide encode; clean rows in the same
    batch still encode. strict=True restores the hard error."""
    import pytest

    from etl_fraud_detection_spark.operators import bpe

    docs = spark.createDataFrame(
        [(0, "pasted markup a</w>b here"), (1, "clean text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe.encode_documents(docs, []).collect()}
    assert rows[0]["bpe_tokens"] is None
    assert rows[0]["n_bpe_tokens"] is None
    assert rows[1]["bpe_tokens"] is not None
    assert rows[1]["n_bpe_tokens"] == len(rows[1]["bpe_tokens"])
    with pytest.raises(Exception, match="terminal marker"):
        bpe.encode_documents(docs, [], strict=True).collect()


def test_incremental_merge_loop_equals_naive():
    """_merge_loop (incremental: pair→word index + lazy-deletion heap)
    must select the IDENTICAL merge sequence as _merge_loop_naive
    (full recount per round) on arbitrary vocabularies — including
    overlapping pairs (aaa), reappearing pairs, count ties, and
    merge budgets past exhaustion."""
    import random

    from collections import Counter

    rng = random.Random(20260815)
    alphabet = "abcdef"
    for trial in range(40):
        vocab = Counter()
        for _ in range(rng.randint(1, 30)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 12))
            )
            vocab[bpe._word_symbols(w)] += rng.randint(1, 9)
        for n in (0, 1, 7, 200):
            assert bpe._merge_loop(
                Counter(vocab), n
            ) == bpe._merge_loop_naive(Counter(vocab), n), (trial, n)
    # the classic overlap corner explicitly
    v = Counter({bpe._word_symbols("aaaa"): 3, bpe._word_symbols("aab"): 2})
    assert bpe._merge_loop(Counter(v), 50) == bpe._merge_loop_naive(
        Counter(v), 50
    )


def test_distributed_training_splits_like_str_split(spark):
    """html_extract emits newline-joined block text: the distributed
    word counter must split on whitespace RUNS (str.split() semantics
    incl. \\t, \\n, NBSP), not single spaces — else it learns
    newline-bearing symbols the encoder can never produce."""
    from etl_fraud_detection_spark.operators import bpe

    texts = [
        "first block\nsecond block\nthe end",
        "tabs\there\tand  double  spaces",
        "nbsp separated words em-space",
        " leading and trailing \n",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (5, 25):
        got = bpe.train_merges_distributed(docs, n)
        assert got == bpe.train_bpe(texts, n), n
        assert all("\n" not in a + b and "\t" not in a + b for a, b in got)


def test_distributed_training_equals_driver_side(spark):
    """train_merges_distributed (Spark word-frequency pass + shared
    merge loop) must produce the IDENTICAL merge list as train_bpe
    over the same texts — the distributed path changes where the
    counting runs, never the learned rules."""
    from etl_fraud_detection_spark.operators import bpe

    texts = [
        "low lower lowest newer newest wide wider widest",
        "the lower the wider the newer the better better",
        "low low low newest newest wide",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (0, 5, 20):
        assert bpe.train_merges_distributed(docs, n) == bpe.train_bpe(
            texts, n
        ), n
    # and the trained table round-trips through the distributed encoder
    merges = bpe.train_merges_distributed(docs, 12)
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe.encode_documents(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == bpe.encode_text(t, merges)
