"""Property-based tests (hypothesis) for the round-2 operators: the
invariants that must hold for EVERY input, not just the goldens."""

from hypothesis import given, settings, strategies as st

from etl_fraud_detection_spark.operators import bpe

WORDS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
TEXTS = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(TEXTS, st.integers(min_value=0, max_value=12))
def test_bpe_encode_is_lossless(text, n_merges):
    """Concatenating a word's BPE tokens and stripping the terminal
    marker must reproduce the word exactly — for any corpus-trained
    merge table and any input (including words never seen in
    training)."""
    merges = bpe.train_bpe([text, "shared prefix shared suffix"], n_merges)
    for w in text.split():
        toks = bpe.encode_word(w, merges)
        assert "".join(toks) == w + bpe.WORD_END
        assert all(t for t in toks)


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_bpe_token_count_never_exceeds_chars(text):
    merges = bpe.train_bpe([text], 6)
    toks = bpe.encode_text(text, merges)
    words = [w for w in text.split() if w]
    # one token minimum per word; at most chars+1 per word (char split)
    assert len(toks) >= len(words)
    assert len(toks) <= sum(len(w) + 1 for w in words)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_pcm(samples, rate):
    from etl_fraud_detection_spark.functions import wav

    payload = wav.encode_wav(rate, 1, samples)
    got_rate, got_ch, got = wav.decode_wav(payload)
    assert (got_rate, got_ch, got) == (rate, 1, samples)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
def test_int8_quantization_error_bound(vec):
    """Pure-python mirror of quantize_int8's arithmetic: codes stay in
    [-127, 127] and per-element reconstruction error <= scale/2 + eps
    (the bound symmetric round-to-nearest guarantees for |x| <= max)."""
    import math

    xs = [float(x) for x in vec]
    scale = max(abs(x) for x in xs) / 127.0
    for x in xs:
        if scale == 0:
            code = 0
        else:
            code = min(127, max(-127, int(math.floor(x / scale + 0.5))))
        assert -127 <= code <= 127
        err = abs(code * scale - x)
        assert err <= scale / 2 + 1e-9 * max(1.0, abs(x))
