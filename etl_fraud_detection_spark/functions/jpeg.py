"""Pure-stdlib baseline JPEG codec — completes the multimodal decode
story (PNG: functions/png.py, WAV: functions/wav.py, JPEG: here). No
imaging libraries; only ``struct``/``math``.

Scope (the baseline-sequential interchange subset):
- encoder: 8-bit grayscale or RGB, 4:4:4 or 4:2:0 (subsample=True),
  ITU-T81 Annex K standard Huffman tables, configurable quantization
  (default all-ones = near-lossless at 4:4:4);
- decoder: baseline sequential DCT (SOF0), 1 or 3 components, any
  sampling factors in {1,2} (covers 4:4:4, 4:2:2, 4:2:0 — what real
  files use), no restart markers / no progressive — anything else
  raises JpegError and flows through the opaque-bytes path.

The DCT is the textbook separable float 8-point DCT-II/III; encoding is
lossy by nature, so tests assert exact header dims, exact round-trip of
flat blocks under unit quantization, and a PSNR floor for structured
content (tests/test_jpeg_codec.py).
"""

from __future__ import annotations

import math
import struct

__all__ = ["JpegError", "encode_jpeg", "decode_jpeg"]


class JpegError(ValueError):
    """Payload is not a decodable baseline 4:4:4 JPEG."""


ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T81 Annex K standard Huffman table specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block):  # block: 64 floats (level-shifted), row-major
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * _COS[u][x] * _COS[v][y]
            out[v * 8 + u] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef):
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += _C[u] * _C[v] * coef[v * 8 + u] * _COS[u][x] * _COS[v][y]
            out[y * 8 + x] = 0.25 * s
    return out


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------


def _build_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per ITU-T81 C.2."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, values):
    """(bits, values) -> {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v):
    """JPEG magnitude coding: value -> (size, raw bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits, size):
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegError("truncated after 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise JpegError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self):
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table):
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return y, cb, cr


def _encode_block(samples, quant, dc_codes, ac_codes, pred, writer):
    coef = _fdct([s - 128.0 for s in samples])
    q = [int(round(coef[i] / quant[i])) for i in range(64)]
    zz = [q[ZIGZAG[i]] for i in range(64)]
    dc_diff = zz[0] - pred
    size, bits = _magnitude(dc_diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(zz[i])
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return zz[0]


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quant_luma: list[int] | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode 8-bit grayscale (channels=1) or RGB (channels=3) pixels
    as a baseline JFIF JPEG — 4:4:4 by default, 4:2:0 (2x2 luma, 2x2
    chroma averaging) with ``subsample=True``. Default quantization is
    all-ones (near-lossless at 4:4:4)."""
    if channels not in (1, 3):
        raise JpegError("encoder supports 1 or 3 channels")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer size mismatch")
    ql = quant_luma or [1] * 64
    qc = ql  # one shared table keeps the fixture simple
    full = [[] for _ in range(channels)]
    for i in range(width * height):
        if channels == 1:
            full[0].append(float(pixels[i]))
        else:
            y, cb, cr = _rgb_to_ycbcr(
                pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            )
            full[0].append(y)
            full[1].append(cb)
            full[2].append(cr)

    sub = subsample and channels == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * channels
    hmax = max(h for h, v in samp)
    vmax = max(v for h, v in samp)

    # per-component planes at their own resolution (chroma averaged 2x2)
    planes, dims = [], []
    for ci, (h, v) in enumerate(samp):
        cw = -(-width * h // hmax)
        chh = -(-height * v // vmax)
        if (cw, chh) == (width, height):
            planes.append(full[ci])
        else:
            p = []
            for y in range(chh):
                for x in range(cw):
                    acc, n = 0.0, 0
                    for dy in range(vmax // v):
                        for dx in range(hmax // h):
                            sy = y * (vmax // v) + dy
                            sx = x * (hmax // h) + dx
                            if sy < height and sx < width:
                                acc += full[ci][sy * width + sx]
                                n += 1
                    p.append(acc / n)
            planes.append(p)
        dims.append((cw, chh))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_ql = bytes(ql[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_ql
    if channels == 3:
        zz_qc = bytes(qc[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + zz_qc
    # SOF0
    ncomp = channels
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for ci in range(ncomp):
        h, v = samp[ci]
        out += struct.pack("BBB", ci + 1, (h << 4) | v, 0 if ci == 0 else 1)
    # DHT
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )[: 4 if channels == 3 else 2]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += struct.pack("B", (cls << 4) | tid) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_l = _build_codes(*_DC_LUMA)
    ac_l = _build_codes(*_AC_LUMA)
    dc_c = _build_codes(*_DC_CHROMA)
    ac_c = _build_codes(*_AC_CHROMA)
    quants = [ql] + [qc] * (channels - 1)
    dcs = [dc_l] + [dc_c] * (channels - 1)
    acs = [ac_l] + [ac_c] * (channels - 1)

    w = _BitWriter()
    preds = [0] * channels
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(channels):
                h, v = samp[ci]
                cw, chh = dims[ci]
                for by in range(v):
                    for bx in range(h):
                        block = []
                        for y in range(8):
                            for x in range(8):
                                sx = min(mx * 8 * h + bx * 8 + x, cw - 1)
                                sy = min(my * 8 * v + by * 8 + y, chh - 1)
                                block.append(planes[ci][sy * cw + sx])
                        preds[ci] = _encode_block(
                            block, quants[ci], dcs[ci], acs[ci], preds[ci], w
                        )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline 4:4:4 JPEG -> (width, height, channels,
    pixels row-major). Grayscale yields 1 channel, color 3 (RGB)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comps = []  # (id, h, v, tq)
    scan_comps = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise JpegError("marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                zz = list(seg[i + 1 : i + 65])
                table = [0] * 64
                for j in range(64):
                    table[ZIGZAG[j]] = zz[j]
                quant[tq] = table
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                h, v = hv >> 4, hv & 0xF
                if h not in (1, 2) or v not in (1, 2):
                    raise JpegError("sampling factors beyond 2 unsupported")
                comps.append((cid, h, v, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tables = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cid, tables >> 4, tables & 0xF))
            pos = pos + 2 + seg_len
            return _decode_scan(
                payload, pos, width, height, comps, scan_comps, quant, huff
            )
        pos += 2 + seg_len
    raise JpegError("no scan data")


def _decode_scan(data, pos, width, height, comps, scan_comps, quant, huff):
    if width is None or not comps:
        raise JpegError("SOS before SOF")
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise JpegError("1 or 3 components only")
    r = _BitReader(data, pos)
    samp = {cid: (h, v) for cid, h, v, _ in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # per-component plane (own resolution, padded to the MCU grid)
    pdims = {}
    planes = {}
    for cid, h, v, _ in comps:
        pw, ph = mcus_x * 8 * h, mcus_y * 8 * v
        pdims[cid] = (pw, ph)
        planes[cid] = [0.0] * (pw * ph)
    preds = {cid: 0 for cid, _, _, _ in comps}
    comp_q = {cid: quant[tq] for cid, _, _, tq in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, dc_id, ac_id in scan_comps:
                dc_tab = huff.get((0, dc_id))
                ac_tab = huff.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise JpegError("missing Huffman table")
                h, v = samp[cid]
                q = comp_q[cid]
                pw, _ph = pdims[cid]
                for by in range(v):
                    for bx in range(h):
                        zz = [0] * 64
                        size = r.huff(dc_tab)
                        diff = _extend(r.bits(size), size) if size else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = r.huff(ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise JpegError("AC index out of range")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i] * q[ZIGZAG[i]]
                        blk = _idct(coef)
                        ox = mx * 8 * h + bx * 8
                        oy = my * 8 * v + by * 8
                        for y in range(8):
                            base = (oy + y) * pw + ox
                            for x in range(8):
                                planes[cid][base + x] = blk[y * 8 + x] + 128.0
    out = bytearray()
    cids = [cid for cid, _, _, _ in comps]
    for y in range(height):
        for x in range(width):
            if ncomp == 1:
                pw, _ = pdims[cids[0]]
                out.append(
                    max(0, min(255, int(round(planes[cids[0]][y * pw + x]))))
                )
            else:
                vals = []
                for cid in cids:
                    h, v = samp[cid]
                    pw, _ = pdims[cid]
                    # replication upsample from the component's grid
                    vals.append(planes[cid][(y * v // vmax) * pw + (x * h // hmax)])
                yy, cb, cr = vals[0], vals[1] - 128, vals[2] - 128
                rr = yy + 1.402 * cr
                gg = yy - 0.344136 * cb - 0.714136 * cr
                bb = yy + 1.772 * cb
                for val in (rr, gg, bb):
                    out.append(max(0, min(255, int(round(val)))))
    return width, height, ncomp, bytes(out)
