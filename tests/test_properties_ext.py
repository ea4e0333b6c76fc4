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


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-30000, max_value=30000), min_size=1, max_size=96
    ),
    st.integers(min_value=2, max_value=11),
)
def test_ehash_amplitude_and_polarity_invariant(samples, k):
    """The audio energy hash must be invariant under exact amplitude
    rescale and polarity flip for ANY PCM sequence — renormalized
    copies of a recording are the same recording."""
    from etl_fraud_detection_spark.operators.multimodal import ehash_16

    h = ehash_16(samples)
    assert ehash_16([s * k for s in samples]) == h
    assert ehash_16([-s for s in samples]) == h
    assert 0 <= h < (1 << 16)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
def test_hamming_banding_pigeonhole(h, flips):
    """For ANY 64-bit hash and ANY <=3 bit flips, at least one of the
    four 16-bit bands must be untouched — the recall guarantee the
    banded Hamming join depends on."""
    v = h
    for b in flips:
        v ^= 1 << b
    shared = any(
        (h >> (16 * band)) & 0xFFFF == (v >> (16 * band)) & 0xFFFF
        for band in range(4)
    )
    assert shared


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=255),
)
def test_ahash_constant_shift_invariant_no_wrap(w, h, ch, base_val):
    """Adding a constant to every pixel (no wraparound) must not change
    the average hash: 64*(g+c) > total+64c iff 64*g > total. This is
    the brightness-shift invariance the video near-dup documents."""
    from etl_fraud_detection_spark.operators.multimodal import ahash_64

    px = bytes(
        (base_val + (x * 7 + y * 13) % 97) % 180  # headroom for +50
        for y in range(h) for x in range(w) for c in range(ch)
    )
    shifted = bytes(min(v + 50, 255) for v in px)
    assert max(px) + 50 <= 255
    assert ahash_64(w, h, ch, px) == ahash_64(w, h, ch, shifted)
