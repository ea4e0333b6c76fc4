"""Pure-stdlib baseline JPEG codec: header exactness, round-trip
quality, the unit-quant exactness the fixture oracles rely on, and the
opaque-path guarantees."""

import math

import pytest

from etl_fraud_detection_spark.functions import jpeg


def _psnr(a: bytes, b: bytes) -> float:
    mse = sum((x - y) ** 2 for x, y in zip(a, b)) / len(a)
    return 10 * math.log10(255**2 / max(mse, 1e-12))


def test_flat_gray_roundtrips_exactly():
    px = bytes([77] * 64)
    w, h, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(8, 8, 1, px))
    assert (w, h, ch) == (8, 8, 1)
    assert out == px


def test_fixture_patterns_roundtrip_exactly():
    """The oracle of q_multimodal_features treats the ORIGINAL pixels
    as ground truth for the JPEG fixtures — pinned here."""
    from etl_fraud_detection_spark.plans.queries_ext import (
        _MEDIA_JPEG_DIMS,
        _media_jpeg_px,
    )

    for mid, (w, h) in _MEDIA_JPEG_DIMS.items():
        px = _media_jpeg_px(mid)
        gw, gh, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, 1, px))
        assert (gw, gh, ch) == (w, h, 1)
        assert out == px, f"fixture {mid} no longer round-trips exactly"


def test_rgb_roundtrip_high_psnr_nonmultiple_dims():
    w, h = 10, 6
    px = bytes(
        [(x * 31 + y * 17 + c * 53) % 256 for y in range(h) for x in range(w) for c in range(3)]
    )
    gw, gh, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, 3, px))
    assert (gw, gh, ch) == (w, h, 3)
    assert _psnr(px, out) > 40


def test_lossy_quant_still_decodes_reasonably():
    w, h = 16, 16
    px = bytes([(x * 5 + y * 3) % 256 for y in range(h) for x in range(w)])
    q = [16] * 64  # genuinely lossy table
    gw, gh, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, 1, px, quant_luma=q))
    assert (gw, gh) == (w, h)
    assert _psnr(px, out) > 25


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"\x89PNG\r\n\x1a\n",
        bytes.fromhex("ffd8ffe000104a46494600010100ffd9"),  # headers, no scan
        b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00",  # progressive
    ],
)
def test_garbage_and_unsupported_raise(payload):
    with pytest.raises(jpeg.JpegError):
        jpeg.decode_jpeg(payload)


def test_byte_stuffing_survives():
    # search a pattern that forces 0xFF bytes into the entropy stream
    for seed in range(40):
        w = h = 8
        px = bytes([(x * seed + y * (seed + 3)) % 256 for y in range(h) for x in range(w)])
        payload = jpeg.encode_jpeg(w, h, 1, px)
        scan = payload[payload.find(b"\xff\xda") + 2 :]
        _, _, _, out = jpeg.decode_jpeg(payload)
        if b"\xff\x00" in scan:
            assert out == px or _psnr(px, out) > 45
            return
    pytest.skip("no stuffed byte produced in 40 seeds")


def test_mjpeg_frame_extraction(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_mjpeg_frames,
    )
    from etl_fraud_detection_spark.plans.queries_ext import (
        _MJPEG_NFRAMES,
        _mjpeg_payload,
    )

    media = spark.createDataFrame(
        [(1, "mjpeg", 12, 10, _mjpeg_payload())], schema=MEDIA_SCHEMA
    )
    all_frames = extract_mjpeg_frames(media, stride=1).collect()
    assert [r.frame_idx for r in sorted(all_frames, key=lambda r: r.frame_idx)] == list(
        range(_MJPEG_NFRAMES)
    )
    assert all((r.frame_width, r.frame_height) == (12, 10) for r in all_frames)
    # frames differ (brightness ramps with the per-frame offset)
    assert len({round(r.frame_brightness, 6) for r in all_frames}) > 1


def test_420_smooth_high_psnr_nonmultiple_of_16():
    w, h = 21, 11
    px = bytes([min(255, x * 8 + c * 10) for y in range(h) for x in range(w) for c in range(3)])
    gw, gh, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, 3, px, subsample=True))
    assert (gw, gh, ch) == (w, h, 3)
    assert _psnr(px, out) > 45


def test_420_declares_sampling_factors():
    payload = jpeg.encode_jpeg(16, 16, 3, bytes(16 * 16 * 3), subsample=True)
    sof = payload.find(b"\xff\xc0")
    # component 1 (luma) hv byte must be 0x22, chroma 0x11
    assert payload[sof + 11] == 0x22
    assert payload[sof + 14] == 0x11


def test_sampling_factor_3_rejected():
    # hand-build an SOF0 with h=3 (unsupported) and expect a clean error
    import struct as _s

    payload = bytearray(jpeg.encode_jpeg(8, 8, 1, bytes(64)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 11] = 0x31  # h=3, v=1
    with pytest.raises(jpeg.JpegError):
        jpeg.decode_jpeg(bytes(payload))
