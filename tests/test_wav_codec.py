"""Pure-stdlib WAV codec: round-trip fidelity and the opaque-path
guarantees the audio feature extractor relies on."""

import pytest

from etl_fraud_detection_spark.functions import wav


def test_roundtrip_mono():
    samples = [((i * 37) % 200 - 100) * 80 for i in range(50)]
    payload = wav.encode_wav(8000, 1, samples)
    rate, ch, got = wav.decode_wav(payload)
    assert (rate, ch) == (8000, 1)
    assert got == samples


def test_roundtrip_stereo_extremes():
    samples = [-32768, 32767, 0, -1, 12345, -12345]
    payload = wav.encode_wav(44100, 2, samples)
    rate, ch, got = wav.decode_wav(payload)
    assert (rate, ch) == (44100, 2)
    assert got == samples


def test_misaligned_channel_count_rejected():
    with pytest.raises(wav.WavError):
        wav.encode_wav(8000, 2, [1, 2, 3])


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF\xaa\xbb\x00\x00WAVEfmt ",  # truncated header (fixture 8)
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,  # wrong container
    ],
)
def test_garbage_raises_waverror(payload):
    with pytest.raises(wav.WavError):
        wav.decode_wav(payload)


def test_audio_features_on_spark(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    samples = [100, -200, 300, -400]
    rows = [
        (1, "wav", 0, 0, wav.encode_wav(1000, 1, samples)),
        (2, "bin", 0, 0, b"\x00\x01\x02"),
    ]
    out = {
        r.media_id: r
        for r in extract_audio_features(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        ).collect()
    }
    good = out[1]
    assert (good.sample_rate, good.n_channels, good.n_frames) == (1000, 1, 4)
    assert good.duration_s == 4 / 1000
    assert good.peak_abs == 400
    assert good.mean_abs == (100 + 200 + 300 + 400) / 4
    assert out[2].sample_rate is None and out[2].n_bytes == 3
