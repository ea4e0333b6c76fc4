"""Pure-stdlib PNG codec (functions/png.py): round trips, all five
scanline filter reversals, nearest-neighbor resample, and the Spark
resize operator producing genuinely re-encoded rasters."""

import struct
import zlib

import pytest

from etl_fraud_detection_spark.functions import png


def ramp(w, h, ch):
    return bytes((x * 7 + y * 31 + c * 5) % 256 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ch", [(1, 1, 1), (4, 3, 3), (5, 2, 4), (16, 16, 1)])
def test_roundtrip(w, h, ch):
    px = ramp(w, h, ch)
    assert png.decode_png(png.encode_png(w, h, ch, px)) == (w, h, ch, px)


def _encode_with_filters(w, h, ch, px, ftypes):
    """Build a PNG applying a given filter type per scanline — exercises
    the decoder's filter reversal against hand-computed filtered bytes."""
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    for y, ft in enumerate(ftypes):
        line = px[y * stride : (y + 1) * stride]
        f = bytearray()
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = line[i] - left
            elif ft == 2:
                v = line[i] - up
            elif ft == 3:
                v = line[i] - (left + up) // 2
            else:
                v = line[i] - png._paeth(left, up, ul)
            f.append(v & 0xFF)
        out += bytes([ft]) + bytes(f)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        png.MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3])
def test_decoder_reverses_all_filter_types(ch):
    w, h = 6, 5
    px = ramp(w, h, ch)
    payload = _encode_with_filters(w, h, ch, px, [0, 1, 2, 3, 4])
    assert png.decode_png(payload) == (w, h, ch, px)


def test_decode_rejects_non_png():
    with pytest.raises(png.PngError):
        png.decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_resize_nearest_floor_mapping():
    # 4x2 -> 2x1: picks pixels (0,0) and (2,0)
    px = bytes([10, 11, 12, 13, 20, 21, 22, 23])
    assert png.resize_nearest(4, 2, 1, px, 2, 1) == bytes([10, 12])


def test_spark_resize_reencodes_real_raster(spark):
    from etl_fraud_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    w, h, ch = 20, 10, 3
    px = ramp(w, h, ch)
    media = spark.createDataFrame(
        [(1, "png", w, h, png.encode_png(w, h, ch, px))], schema=MEDIA_SCHEMA
    ).coalesce(1)
    r = resize_media(media, max_dim=16).first()
    assert (r.new_width, r.new_height) == (16, 8)
    rw, rh, rch, rpx = png.decode_png(bytes(r.payload))
    assert (rw, rh, rch) == (16, 8, ch)
    assert rpx == png.resize_nearest(w, h, ch, px, 16, 8)
