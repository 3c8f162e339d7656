"""Baseline JFIF JPEG codec — stdlib + numpy, no imaging dependency.

The real-decode tier for ``image/jpeg`` blobs (ITU-T T.81 baseline
sequential, the format of essentially every camera/web JPEG):

- ``decode_jpeg``: marker parse (APP*/COM skipped, DQT, SOF0, DHT, DRI,
  SOS), Huffman entropy decode with byte-unstuffing and RSTn restart
  handling, dequantize + inverse zigzag + 2-D IDCT per 8x8 block,
  4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, YCbCr->RGB. PROGRESSIVE
  (SOF2) streams route to the multi-scan engine (spectral selection +
  successive approximation, DC and AC first/refinement passes, EOB
  runs — T.81 G.2); 12-BIT baseline streams decode for real (16-bit
  DQT entries, extended Huffman categories, level shift 2048, samples
  folded to the 8-bit pipeline by 2^-(P-8)); LOSSLESS (SOF3) streams
  decode for real (Annex-H predictive engine, all 7 predictors,
  mod-2^16 Huffman differences — pinned EXACT against the encoder
  twin); only arithmetic-coded and hierarchical shapes raise
  UnsupportedJpeg (a ValueError subclass) and fall through to the PIL
  tier / tagged stub in binary_ops._decode, countable in the feature
  table.
- ``make_jpeg``: the test-side twin — baseline 4:4:4 encoder with the
  Annex-K example quantization (quality-scaled) and Huffman tables, so
  the suite can construct REAL JPEG bytes and pin decode fidelity
  against the lossless PPM twin of the same pixels
  (tests/test_multimodal.py).
- ``make_jpeg_progressive``: progressive 4:4:4 encoder over the SAME
  quantized coefficients as ``make_jpeg`` (DC first Al=1 + DC refine,
  split-band AC first Al=1 + AC refine with EOB-run accumulation) —
  decoding its output must be BIT-IDENTICAL to decoding the baseline
  twin, the strongest cross-check available without golden binaries.

Like decode_png in binary_ops (the precedent), correctness is pinned by
construction + roundtrip fidelity bounds, not by golden binaries: the
container ships no JPEG sample files and no PIL.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared tables (ITU-T T.81 Annex K) ---------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63])

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99])

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99])

# Annex K Huffman specs: (BITS counts for lengths 1..16, HUFFVAL symbols)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


# Extended-precision tables for 12-bit streams (T.81 F.1.2: DC SSSS to
# 15, AC size to 14 — the Annex K example tables only reach the 8-bit
# ranges). Canonical flat-length codes: 16 DC symbols at 5 bits, 226 AC
# symbols (EOB + ZRL + 16 runs x 14 sizes) at 8 bits — valid Kraft sums,
# no all-ones code, and the DHT segment carries them so any conforming
# decoder reads the stream.
DC12_SPEC = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
AC12_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 226] + [0] * 8,
    [0x00, 0xF0] + [(r << 4) | sz for r in range(16) for sz in range(1, 15)],
)


def _huff_codes(spec):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} (canonical T.81 order)."""
    counts, symbols = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(spec):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    return {(ln, c): s for s, (c, ln) in _huff_codes(spec).items()}


_DCT = np.array([[np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
                  * np.cos((2 * x + 1) * u * np.pi / 16.0)
                  for x in range(8)] for u in range(8)])


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    return np.clip(np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb], axis=-1).round(), 0, 255).astype(np.uint8)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


# -- encoder ------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 coefficient coding: value -> (size category, appended bits)."""
    size = int(v != 0 and int(abs(v)).bit_length())
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, block, qtbl, dc_code, ac_code, pred, center=128.0):
    """DCT + quantize + entropy-code one 8x8 block; returns the new DC.
    ``center`` is the level shift — 2^(P-1): 128 for 8-bit, 2048 for
    12-bit samples (T.81 A.3.1)."""
    coef = _DCT @ (block - center) @ _DCT.T
    q = np.round(coef.ravel() / qtbl).astype(np.int64)[ZIGZAG]
    dc = int(q[0])
    size, bits = _magnitude(dc - pred)
    bw.put(*dc_code[size])
    if size:
        bw.put(bits, size)
    run = 0
    for v in q[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_code[0xF0])  # ZRL
            run -= 16
        size, bits = _magnitude(int(v))
        bw.put(*ac_code[(run << 4) | size])
        bw.put(bits, size)
        run = 0
    if run:
        bw.put(*ac_code[0x00])  # EOB
    return dc


def make_jpeg(img: np.ndarray, quality: int = 90,
              subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 chroma,
    the camera/web default — also what gives decode_jpeg's upsampling
    path real test coverage). ``restart_interval``: emit a DRI segment
    and RSTn markers every N MCUs (0 = none) — exercises decode_jpeg's
    restart resynchronization."""
    if subsample not in ("444", "420"):
        raise ValueError(subsample)
    h, w = img.shape[:2]
    qt = [_quality_scale(Q_LUMA, quality), _quality_scale(Q_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(img)
    ysamp = (2, 2) if subsample == "420" else (1, 1)
    mcu_px = 8 * ysamp[0]
    ycc = np.pad(ycc, ((0, -h % mcu_px), (0, -w % mcu_px), (0, 0)),
                 mode="edge")
    if subsample == "420":
        cb = ycc[:, :, 1].reshape(ycc.shape[0] // 2, 2,
                                  ycc.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = ycc[:, :, 2].reshape(ycc.shape[0] // 2, 2,
                                  ycc.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[:, :, 1], ycc[:, :, 2]
    planes = [ycc[:, :, 0], cb, cr]
    samps = [ysamp, (1, 1), (1, 1)]

    dc_codes = [_huff_codes(DC_LUMA_SPEC), _huff_codes(DC_CHROMA_SPEC)]
    ac_codes = [_huff_codes(AC_LUMA_SPEC), _huff_codes(AC_CHROMA_SPEC)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(ycc.shape[0] // mcu_px):
        for mx in range(ycc.shape[1] // mcu_px):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            mcu_count += 1
            for comp, ((hs, vs), plane) in enumerate(zip(samps, planes)):
                tsel = 0 if comp == 0 else 1
                for v in range(vs):
                    for u in range(hs):
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        pred[comp] = _encode_block(
                            bw, plane[y0:y0 + 8, x0:x0 + 8], qt[tsel],
                            dc_codes[tsel], ac_codes[tsel], pred[comp])
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sy = (ysamp[0] << 4) | ysamp[1]
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, tbl in enumerate(qt):
        out += seg(0xFFDB, bytes([tid]) + bytes(tbl.ravel()[ZIGZAG].tolist()))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, sy, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, spec in ((0, 0, DC_LUMA_SPEC), (1, 0, AC_LUMA_SPEC),
                           (0, 1, DC_CHROMA_SPEC), (1, 1, AC_CHROMA_SPEC)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_jpeg12(img: np.ndarray, quality: int = 90) -> bytes:
    """12-bit-precision baseline twin (T.81 extended sequential ranges in
    a SOF0 frame): the SAME 8-bit pixels encoded as 12-bit samples
    (x16 — Y 0..4080, chroma centered 2048, level shift 2048), 4:4:4,
    quantized by the SAME quality-scaled tables but carried as Pq=1
    16-bit DQT entries, entropy-coded with the extended DC12/AC12
    Huffman tables a 12-bit stream requires. Because the samples carry
    4 extra fraction bits against an unchanged quantizer, decoding this
    stream must be at least as faithful to the source pixels as the
    8-bit encode at the same quality — the fidelity-ordering pin."""
    h, w = img.shape[:2]
    qt = [_quality_scale(Q_LUMA, quality), _quality_scale(Q_CHROMA, quality)]
    ycc = np.pad(_rgb_to_ycbcr(img) * 16.0,
                 ((0, -h % 8), (0, -w % 8), (0, 0)), mode="edge")
    dc_codes = _huff_codes(DC12_SPEC)
    ac_codes = _huff_codes(AC12_SPEC)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(ycc.shape[0] // 8):
        for mx in range(ycc.shape[1] // 8):
            for comp in range(3):
                tsel = 0 if comp == 0 else 1
                pred[comp] = _encode_block(
                    bw, ycc[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8, comp],
                    qt[tsel], dc_codes, ac_codes, pred[comp], center=2048.0)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00"
               + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, tbl in enumerate(qt):  # Pq=1: 16-bit big-endian entries
        out += seg(0xFFDB, bytes([(1 << 4) | tid])
                   + struct.pack(">64H", *tbl.ravel()[ZIGZAG].tolist()))
    out += seg(0xFFC0, struct.pack(">BHHB", 12, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, spec in ((0, 0, DC12_SPEC), (1, 0, AC12_SPEC),
                           (0, 1, DC12_SPEC), (1, 1, AC12_SPEC)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid])
                   + bytes(spec[0]) + bytes(spec[1]))
    out += seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11])
               + b"\x00\x3f\x00")
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder ------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy segment with 0xFF00
    unstuffing; RSTn markers reset byte alignment (caller resets DC)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _Restart(nxt)
            else:
                raise EOFError("marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self):
        """At a restart boundary: drop pad bits (byte-align) and consume
        the RSTn marker that must sit at the aligned position."""
        self.acc = 0
        self.n = 0
        # tolerate 0xFF fill bytes before the marker (T.81 B.1.1.2)
        while (self.pos + 2 < len(self.data)
               and self.data[self.pos] == 0xFF
               and self.data[self.pos + 1] == 0xFF):
            self.pos += 1
        b0 = self.data[self.pos]
        b1 = self.data[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class UnsupportedJpeg(ValueError):
    """A WELL-FORMED stream whose coding shape this tier does not decode
    (arithmetic-coded, hierarchical/lossless SOFn, 12/16-bit precision).
    Distinct from generic ValueError (corrupt stream) so the feature
    extractor can tag the stub fallback and the rate stays countable."""


class _Restart(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline sequential JFIF -> (h, w, 3) uint8 RGB. Raises ValueError
    on progressive/arithmetic/12-bit streams (PIL-tier shapes)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = None  # [(cid, hsamp, vsamp, qsel)]
    h = w = None
    precision = 8
    restart_interval = 0
    scan = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        data = blob[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(data):
                prec, tid = data[i] >> 4, data[i] & 0x0F
                tbl = np.zeros(64, np.int32)
                if prec:  # Pq=1: 16-bit entries (12-bit sample streams)
                    tbl[ZIGZAG] = np.frombuffer(
                        data[i + 1:i + 129], ">u2").astype(np.int32)
                    i += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(data[i + 1:i + 65], np.uint8)
                    i += 65
                qts[tid] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, n = struct.unpack(">BHHB", data[:6])
            if prec not in (8, 12):
                raise UnsupportedJpeg(f"{prec}-bit precision — PIL tier")
            if n not in (1, 3):
                # 4-component CMYK/YCCK (Adobe APP14): decoding it through
                # the YCbCr path would silently drop K and produce wrong
                # colors — raise to the countable tagged stub instead
                raise UnsupportedJpeg(f"{n}-component JPEG — PIL tier")
            from serene_spark.multimodal.binary_ops import _check_dims

            _check_dims(w, h)
            precision = prec
            comps = []
            for c in range(n):
                cid, samp, qsel = data[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, qsel))
        elif marker == 0xC2:  # SOF2 progressive — the multi-scan engine
            return _decode_progressive(blob)
        elif marker == 0xC3:  # SOF3 lossless — the predictive engine
            return _decode_lossless(blob)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(f"unsupported JPEG (SOF{marker - 0xC0}) — PIL tier")
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 0x0F
                counts = list(data[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(data[i + 17:i + 17 + nsym])
                tab = _huff_decoder((counts, symbols))
                (ac_tabs if cls else dc_tabs)[tid] = tab
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan = []
            for c in range(ns):
                cid, tsel = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _q in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)

    br = _BitReader(blob, pos)
    pred = {cid: 0 for cid, *_ in comps}
    # 12-bit samples: dividing the IDCT by 2^(P-8) re-centers the plane
    # on the 8-bit range (level shift 2048/16 = 128), so the rest of the
    # pixel pipeline is precision-agnostic
    prec_scale = 1.0 / (1 << (precision - 8))
    idct = _DCT.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.expect_restart()
                pred = {cid: 0 for cid, *_ in comps}
            try:
                for (cid, hs, vs, qsel), (scid, dct_, act_) in zip(comps, scan):
                    for v in range(vs):
                        for u in range(hs):
                            s = _decode_huff(br, dc_tabs[dct_])
                            diff = _extend(br.bits(s), s)
                            pred[cid] += diff
                            zz = np.zeros(64, np.int64)
                            zz[0] = pred[cid]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(br, ac_tabs[act_])
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                zz[k] = _extend(br.bits(size), size)
                                k += 1
                            coef = np.zeros(64, np.float64)
                            coef[ZIGZAG] = zz * qts[qsel][ZIGZAG]
                            block = (idct @ coef.reshape(8, 8) @ _DCT
                                     ) * prec_scale + 128.0
                            y0 = (my * vs + v) * 8
                            x0 = (mx * hs + u) * 8
                            planes[cid][y0:y0 + 8, x0:x0 + 8] = block
            except _Restart as exc:  # RSTn inside an MCU = corrupt stream
                raise ValueError("unexpected restart marker") from exc
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for cid, hs, vs, _q in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# -- lossless (SOF3) engine: T.81 Annex H -------------------------------------

# difference categories 0..16 (SSSS=16 carries no appended bits and means
# exactly 32768, H.1.2.2) — flat 5-bit canonical codes, valid Kraft sum
DCL_SPEC = ([0, 0, 0, 0, 17] + [0] * 11, list(range(17)))


def _predict(plane, x, y, sel, p, al):
    """T.81 H.1.2.1 sample prediction with the Annex-H edge rules."""
    if y == 0 and x == 0:
        return 1 << (p - 1 - al)
    if y == 0:
        return int(plane[0, x - 1])          # first line: Ra
    if x == 0:
        return int(plane[y - 1, 0])          # first column: Rb
    ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"bad lossless predictor {sel}")


def make_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                       restart_interval: int = 0) -> bytes:
    """Lossless-JPEG (SOF3, T.81 Annex H) twin: RGB planes coded
    directly (lossless JPEG defines no color transform), one interleaved
    scan, the chosen predictor 1-7, Huffman-coded mod-2^16 differences.
    decode_jpeg of this stream must return ``img`` EXACTLY — the one
    tier where the correctness pin is absolute equality, not a fidelity
    bound. ``restart_interval`` emits a DRI segment and RSTn markers
    every N samples, re-initializing prediction to 2^(P-1) per H.2.4."""
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    h, w = img.shape[:2]
    planes = [img[:, :, c].astype(np.int64) for c in range(3)]
    codes = _huff_codes(DCL_SPEC)

    bw = _BitWriter()
    mcu, rst = 0, 0
    at_restart = False
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                at_restart = True
            for plane in planes:
                px = (128 if at_restart
                      else _predict(plane, x, y, predictor, 8, 0))
                diff = (int(plane[y, x]) - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536        # mod-2^16 value, signed window
                size, bits = _magnitude(diff)
                bw.put(*codes[size])
                if size and size != 16:  # SSSS=16: no appended bits
                    bw.put(bits, size)
            at_restart = False
            mcu += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFC3, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(DCL_SPEC[0]) + bytes(DCL_SPEC[1]))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS: Ss = predictor selector, Se = 0, Ah/Al = 0 (Annex H scan header)
    out += seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00])
               + bytes([predictor, 0, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless(blob: bytes) -> np.ndarray:
    """SOF3 decode: marker parse, then one interleaved predictive scan —
    Huffman difference categories, mod-2^16 reconstruction (H.2)."""
    pos = 2
    dc_tabs: dict[int, dict] = {}
    comps = None
    h = w = None
    precision = 8
    restart_interval = 0
    scan = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        data = blob[pos + 4:pos + 2 + length]
        if marker == 0xC3:
            precision, h, w, n = struct.unpack(">BHHB", data[:6])
            if not 2 <= precision <= 16:
                raise ValueError("bad lossless precision")
            if n not in (1, 3):
                raise UnsupportedJpeg(f"{n}-component lossless — PIL tier")
            from serene_spark.multimodal.binary_ops import _check_dims

            _check_dims(w, h)
            comps = []
            for c in range(n):
                cid, samp, _q = data[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise UnsupportedJpeg("subsampled lossless — PIL tier")
                comps.append(cid)
        elif marker == 0xC4:
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 0x0F
                counts = list(data[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(data[i + 17:i + 17 + nsym])
                if cls == 0:
                    dc_tabs[tid] = _huff_decoder((counts, symbols))
                i += 17 + nsym
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            ns = data[0]
            scan = []
            for c in range(ns):
                cid, tsel = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tsel >> 4))
            predictor = data[1 + 2 * ns]       # Ss
            al = data[3 + 2 * ns] & 0x0F       # point transform
            pos = pos + 2 + length
            break
        pos += 2 + length
    if comps is None or scan is None:
        raise ValueError("missing SOF3/SOS")

    planes = [np.zeros((h, w), np.int64) for _ in scan]
    br = _BitReader(blob, pos)
    mcu = 0
    at_restart = False
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.expect_restart()  # byte-align + consume RSTn
                at_restart = True
            for (cid, tsel), plane in zip(scan, planes):
                s = _decode_huff(br, dc_tabs[tsel])
                diff = 32768 if s == 16 else _extend(br.bits(s), s)
                # H.2.4: at the start of each restart interval the
                # prediction re-initializes to 2^(P-1-Al), exactly like
                # the start of the scan — using the neighbors would
                # decode real DRI streams wrong
                pred = (
                    1 << (precision - 1 - al)
                    if at_restart
                    else _predict(plane, x, y, predictor, precision, al)
                )
                plane[y, x] = (pred + diff) & 0xFFFF
            at_restart = False
            mcu += 1

    maxv = (1 << precision) - 1
    shift = max(0, precision - 8)
    out = [np.clip(p, 0, maxv).astype(np.uint32) >> shift for p in planes]
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return np.stack([o.astype(np.uint8) for o in out], axis=-1)


# -- progressive (SOF2) engine: T.81 Annex G.2 --------------------------------


def _decode_progressive(blob: bytes) -> np.ndarray:
    """Multi-scan progressive decode: every scan (DC/AC x first/refine)
    updates per-block coefficient vectors in zigzag order; dequantize +
    IDCT happen ONCE after EOI. Spectral selection, successive
    approximation, and EOB runs per T.81 G.2 / the libjpeg conventions
    (arithmetic >>/| on signed ints for the approximation bits)."""
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] | None = None
    h = w = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag ints
    dims: dict[int, tuple[int, int, int, int]] = {}  # cid -> by,bx,true_by,true_bx
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        data = blob[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(data):
                prec, tid = data[i] >> 4, data[i] & 0x0F
                if prec != 0:
                    raise UnsupportedJpeg("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(data[i + 1:i + 65], np.uint8)
                qts[tid] = tbl
                i += 65
        elif marker == 0xC2:
            prec, h, w, n = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise UnsupportedJpeg("only 8-bit precision supported")
            if n not in (1, 3):
                raise UnsupportedJpeg(f"{n}-component JPEG — PIL tier")
            from serene_spark.multimodal.binary_ops import _check_dims

            _check_dims(w, h)
            comps = []
            for c in range(n):
                cid, samp, qsel = data[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, qsel))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hs, vs, _q in comps:
                by, bx = mcuy * vs, mcux * hs  # MCU-padded block grid
                # non-interleaved scans cover the TRUE component block
                # grid (ceil(comp_dim / 8)), not the MCU-padded one
                true_by = -(-(-(-h * vs // vmax)) // 8)
                true_bx = -(-(-(-w * hs // hmax)) // 8)
                coefs[cid] = np.zeros((by, bx, 64), np.int32)
                dims[cid] = (by, bx, true_by, true_bx)
        elif marker == 0xC4:
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 0x0F
                counts = list(data[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(data[i + 17:i + 17 + nsym])
                tab = _huff_decoder((counts, symbols))
                (ac_tabs if cls else dc_tabs)[tid] = tab
                i += 17 + nsym
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scan = []
            for c in range(ns):
                cid, tsel = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                blob, pos + 2 + length, comps, scan, ss, se, ah, al,
                dc_tabs, ac_tabs, coefs, dims, restart_interval,
            )
            continue
        pos += 2 + length
    if comps is None or not coefs:
        raise ValueError("missing SOF2/SOS")

    # one dequantize + IDCT pass over the accumulated coefficients
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    idct = _DCT.T
    full = []
    for cid, hs, vs, qsel in comps:
        by, bx, _tby, _tbx = dims[cid]
        plane = np.zeros((by * 8, bx * 8), np.float64)
        qt = qts[qsel]
        cz = coefs[cid]
        for y in range(by):
            for x in range(bx):
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = cz[y, x] * qt[ZIGZAG]
                plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] = (
                    idct @ coef.reshape(8, 8) @ _DCT + 128.0
                )
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_scan(blob, pos, comps, scan, ss, se, ah, al,
                 dc_tabs, ac_tabs, coefs, dims, restart_interval) -> int:
    """Decode one progressive entropy-coded segment; returns the byte
    position just past it (at the next marker)."""
    br = _BitReader(blob, pos)
    by_cid = {cid: (hs, vs) for cid, hs, vs, _q in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        pred = {cid: 0 for cid, *_ in scan}
        if len(scan) > 1:  # interleaved over MCUs
            sel = [(cid, by_cid[cid][0], by_cid[cid][1], dct) for cid, dct, _a in scan]
            mcux = dims[scan[0][0]][1] // by_cid[scan[0][0]][0]
            mcuy = dims[scan[0][0]][0] // by_cid[scan[0][0]][1]
            n_units, unit = mcux * mcuy, 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.expect_restart()
                        pred = {cid: 0 for cid in pred}
                    for cid, hs, vs, dct in sel:
                        for v in range(vs):
                            for u in range(hs):
                                _dc_unit(br, ah, al, pred, cid, dct, dc_tabs,
                                         coefs[cid], my * vs + v, mx * hs + u)
                    unit += 1
        else:
            cid, dct, _a = scan[0]
            _by, _bx, tby, tbx = dims[cid]
            unit = 0
            for y in range(tby):
                for x in range(tbx):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.expect_restart()
                        pred = {cid: 0}
                    _dc_unit(br, ah, al, pred, cid, dct, dc_tabs,
                             coefs[cid], y, x)
                    unit += 1
    else:  # AC scan: exactly one component, non-interleaved
        if len(scan) != 1:
            raise ValueError("interleaved AC scan in progressive stream")
        cid, _d, act = scan[0]
        tab = ac_tabs[act]
        cz = coefs[cid]
        _by, _bx, tby, tbx = dims[cid]
        eobrun = 0
        unit = 0
        for y in range(tby):
            for x in range(tbx):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.expect_restart()
                    eobrun = 0
                if ah == 0:
                    eobrun = _ac_first(br, tab, cz[y, x], ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, tab, cz[y, x], ss, se, al, eobrun)
                unit += 1

    # drop partial-byte pad bits; the caller resumes at the next marker
    p = br.pos
    while p + 1 < len(blob) and not (
        blob[p] == 0xFF and blob[p + 1] not in (0x00,)
    ):
        p += 1
    # skip 0xFF fill-byte runs (T.81 B.1.1.2) so the caller lands on
    # the byte pair FF <marker-code>, not FF FF padding
    while p + 2 < len(blob) and blob[p] == 0xFF and blob[p + 1] == 0xFF:
        p += 1
    return p


def _dc_unit(br, ah, al, pred, cid, dct, dc_tabs, cz, y, x):
    if ah == 0:  # first DC pass: Huffman diff of the Al-shifted value
        s = _decode_huff(br, dc_tabs[dct])
        pred[cid] += _extend(br.bits(s), s)
        cz[y, x, 0] = pred[cid] << al
    else:  # refinement: one raw bit, OR into bit Al
        if br.bit():
            cz[y, x, 0] = int(cz[y, x, 0]) | (1 << al)


def _ac_first(br, tab, block, ss, se, al, eobrun) -> int:
    """First AC pass over one block's band; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past Se")
        block[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(br, tab, block, ss, se, al, eobrun) -> int:
    """AC refinement pass (T.81 G.2.2 / libjpeg decode_mcu_AC_refine):
    newly-nonzero coefficients arrive as +-(1<<Al); every nonzero-history
    coefficient crossed consumes one correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size != 1")
                val = p1 if br.bit() else m1
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(block[k])
            if c != 0 and br.bit() and (c & p1) == 0:
                block[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# -- progressive encoder (the test-side twin) ----------------------------------

# Flat 8-bit canonical Huffman table covering EVERY progressive AC symbol:
# EOBn for n=0..14 ((r<<4)|0), ZRL (0xF0 = the r=15,s=0 slot), and all
# (run<<4)|size pairs for size 1..10 — 16*11 = 176 symbols, all length 8
# (176 < 256 leaves the code incomplete, which T.81 permits). The Annex-K
# sequential tables lack the EOBn symbols, so progressive scans need this.
PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def make_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a PROGRESSIVE (SOF2) 4:4:4
    JFIF JPEG over the SAME quantized coefficients as ``make_jpeg`` —
    decode of both must be bit-identical.

    Scan script (exercises every decoder path): interleaved DC first
    pass at Al=1, DC refinement, per-component AC first passes with a
    split luma band (1-5 then 6-63, Al=1 — spectral selection + EOB-run
    accumulation), then per-component AC refinement (Ah=1 -> Al=0)."""
    h, w = img.shape[:2]
    qt = [_quality_scale(Q_LUMA, quality), _quality_scale(Q_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(img)
    ycc = np.pad(ycc, ((0, -h % 8), (0, -w % 8), (0, 0)), mode="edge")
    by, bx = ycc.shape[0] // 8, ycc.shape[1] // 8
    coefs = []
    for comp in range(3):
        tsel = 0 if comp == 0 else 1
        cz = np.zeros((by, bx, 64), np.int64)
        plane = ycc[:, :, comp]
        for y in range(by):
            for x in range(bx):
                c = _DCT @ (plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] - 128.0) @ _DCT.T
                cz[y, x] = np.round(c.ravel() / qt[tsel]).astype(np.int64)[ZIGZAG]
        coefs.append(cz)

    dc_codes = [_huff_codes(DC_LUMA_SPEC), _huff_codes(DC_CHROMA_SPEC)]
    ac_code = _huff_codes(PROG_AC_SPEC)

    def dc_first(al: int) -> bytes:
        bw = _BitWriter()
        pred = [0, 0, 0]
        for y in range(by):
            for x in range(bx):
                for comp in range(3):
                    v = int(coefs[comp][y, x, 0]) >> al  # arithmetic shift
                    size, bits = _magnitude(v - pred[comp])
                    bw.put(*dc_codes[0 if comp == 0 else 1][size])
                    if size:
                        bw.put(bits, size)
                    pred[comp] = v
        bw.flush()
        return bytes(bw.buf)

    def dc_refine(al: int) -> bytes:
        bw = _BitWriter()
        for y in range(by):
            for x in range(bx):
                for comp in range(3):
                    bw.put((int(coefs[comp][y, x, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.buf)

    def flush_eobrun(bw, eobrun, pending):
        if eobrun:
            r = eobrun.bit_length() - 1
            bw.put(*ac_code[r << 4])
            if r:
                bw.put(eobrun - (1 << r), r)
        for b in pending:
            bw.put(b, 1)

    def ac_first(comp: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        eobrun = 0
        for y in range(by):
            for x in range(bx):
                band = coefs[comp][y, x, ss:se + 1]
                tvals = [(int(abs(int(v))) >> al, 1 if v > 0 else -1)
                         for v in band]
                if all(t == 0 for t, _s in tvals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun(bw, eobrun, [])
                        eobrun = 0
                    continue
                flush_eobrun(bw, eobrun, [])
                eobrun = 0
                run = 0
                for t, sgn in tvals:
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        bw.put(*ac_code[0xF0])
                        run -= 16
                    size, bits = _magnitude(t * sgn)
                    bw.put(*ac_code[(run << 4) | size])
                    bw.put(bits, size)
                    run = 0
                if run:
                    eobrun += 1
        flush_eobrun(bw, eobrun, [])
        bw.flush()
        return bytes(bw.buf)

    def ac_refine(comp: int, ss: int, se: int, ah: int, al: int) -> bytes:
        """Exact mirror of the decoder's refinement walk: events are
        n = nonzero-history (one correction bit), v = newly-nonzero
        (symbol + sign), z = zero-history zero (run/ZRL currency)."""
        bw = _BitWriter()
        eobrun = 0
        gpending: list[int] = []
        for y in range(by):
            for x in range(bx):
                events = []
                for v in coefs[comp][y, x, ss:se + 1]:
                    v = int(v)
                    t = abs(v) >> al
                    hist = abs(v) >> ah
                    if hist:
                        events.append(("n", t & 1))
                    elif t:
                        events.append(("v", 1 if v > 0 else 0))
                    else:
                        events.append(("z", 0))
                i, n_ev = 0, len(events)
                while True:
                    nxt = None
                    zcount = 0
                    for jj in range(i, n_ev):
                        if events[jj][0] == "v":
                            nxt = jj
                            break
                        if events[jj][0] == "z":
                            zcount += 1
                    if nxt is None:
                        break
                    while zcount > 15:
                        if eobrun or gpending:
                            flush_eobrun(bw, eobrun, gpending)
                            eobrun, gpending = 0, []
                        bw.put(*ac_code[0xF0])
                        z = 0
                        while z < 16:  # ZRL spans 16 zero-history slots
                            typ, val = events[i]
                            if typ == "n":
                                bw.put(val, 1)
                            else:
                                z += 1
                            i += 1
                        zcount -= 16
                    if eobrun or gpending:
                        flush_eobrun(bw, eobrun, gpending)
                        eobrun, gpending = 0, []
                    bw.put(*ac_code[(zcount << 4) | 1])
                    bw.put(events[nxt][1], 1)  # sign of the new +-(1<<Al)
                    for jj in range(i, nxt):
                        if events[jj][0] == "n":
                            bw.put(events[jj][1], 1)
                    i = nxt + 1
                tail = [val for typ, val in events[i:] if typ == "n"]
                if i < n_ev:  # block tail covered by an EOB run
                    eobrun += 1
                    gpending.extend(tail)
                    if eobrun == 0x7FFF:
                        flush_eobrun(bw, eobrun, gpending)
                        eobrun, gpending = 0, []
        flush_eobrun(bw, eobrun, gpending)
        bw.flush()
        return bytes(bw.buf)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(comp_specs, ss, se, ah, al, body):
        hdr = bytes([len(comp_specs)])
        for cid, tsel in comp_specs:
            hdr += bytes([cid, tsel])
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, hdr) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, tbl in enumerate(qt):
        out += seg(0xFFDB, bytes([tid]) + bytes(tbl.ravel()[ZIGZAG].tolist()))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, spec in ((0, 0, DC_LUMA_SPEC), (0, 1, DC_CHROMA_SPEC),
                           (1, 0, PROG_AC_SPEC)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))
    all_dc = [(1, 0x00), (2, 0x10), (3, 0x10)]
    out += sos(all_dc, 0, 0, 0, 1, dc_first(1))
    out += sos(all_dc, 0, 0, 1, 0, dc_refine(0))
    out += sos([(1, 0x00)], 1, 5, 0, 1, ac_first(0, 1, 5, 1))
    out += sos([(2, 0x00)], 1, 63, 0, 1, ac_first(1, 1, 63, 1))
    out += sos([(3, 0x00)], 1, 63, 0, 1, ac_first(2, 1, 63, 1))
    out += sos([(1, 0x00)], 6, 63, 0, 1, ac_first(0, 6, 63, 1))
    out += sos([(1, 0x00)], 1, 63, 1, 0, ac_refine(0, 1, 63, 1, 0))
    out += sos([(2, 0x00)], 1, 63, 1, 0, ac_refine(1, 1, 63, 1, 0))
    out += sos([(3, 0x00)], 1, 63, 1, 0, ac_refine(2, 1, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)
