"""Minimal pure-stdlib PNG codec (zlib + struct — no PIL in the
container). Enough of the spec for real pixel work on fixture-scale
images:

- decode: 8-bit greyscale (color type 0), RGB (2), RGBA (6); all five
  scanline filters (None/Sub/Up/Average/Paeth); multiple IDAT chunks.
- encode: same color types, filter 0, one IDAT, fixed zlib level for
  deterministic bytes.

Interlaced (Adam7), paletted, and 16-bit images are out of scope and
raise. This is the codec behind operators/multimodal.real_decode — the
point is that decoded width/height/pixels are *real*, not metadata
echoes, while staying importable anywhere Python runs.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


class PngError(ValueError):
    pass


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into (width, height, channels, pixels) where pixels
    is row-major interleaved 8-bit samples."""
    if payload[:8] != MAGIC:
        raise PngError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngError("bad scanline data length")
    out = bytearray(height * stride)
    prev_start = None
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        line = bytearray(raw[fpos + 1 : fpos + 1 + stride])
        start = y * stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start is not None:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start is not None else 0
                line[i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start is not None else 0
                ul = out[prev_start + i - channels] if (prev_start is not None and i >= channels) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"bad filter type {ftype}")
        out[start : start + stride] = line
        prev_start = start
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode row-major interleaved 8-bit samples as a PNG (filter 0,
    fixed compression level => byte-deterministic)."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise PngError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample (floor index mapping — the standard
    src_i = floor(dst_i * src / dst))."""
    out = bytearray(new_width * new_height * channels)
    pos = 0
    for y in range(new_height):
        sy = y * height // new_height
        row = sy * width * channels
        for x in range(new_width):
            sx = x * width // new_width
            px = row + sx * channels
            out[pos : pos + channels] = pixels[px : px + channels]
            pos += channels
    return bytes(out)
