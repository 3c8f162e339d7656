"""Multimodal column plumbing: opaque binary media + typed metadata.

Decode support is tiered by what a dependency-free container can honestly do:

- **audio/WAV**: REAL decode via the stdlib ``wave`` module + numpy PCM
  parsing at 8/16/24/32-bit widths — channels, sample rate, frame count,
  duration, RMS amplitude, zero-crossing rate;
- **image/PNM (P6 PPM + P5 PGM)**: REAL decode — header parse + raw
  numpy array, maxval honored (2-byte big-endian samples above 255,
  rescaling below), with real nearest-neighbor resize and mean-channel
  features;
- **image/PNG**: REAL decode — stdlib zlib inflate + full filter
  reconstruction (types 0-4) for EVERY spec color type (gray, RGB,
  indexed/PLTE at depths 1/2/4/8, gray+alpha, RGBA) at depths up to 16,
  non-interlaced and Adam7-interlaced (``decode_png``); malformed
  streams fall through to the PIL tier;
- **image/JPEG**: REAL decode — baseline sequential JFIF (Huffman entropy
  decode + dequant + IDCT + 4:4:4/4:2:2/4:2:0 upsampling + YCbCr→RGB,
  restart markers handled; see multimodal/jpeg.py) AND progressive
  (SOF2: spectral selection + successive approximation multi-scan
  engine) AND 12-bit baseline AND lossless (SOF3, Annex-H predictive);
  only arithmetic-coded shapes fall through to the PIL tier;
- **image/GIF**: REAL decode — variable-code-width LZW with clear/EOI and
  the KwKwK case, global/local color tables, extension skipping, and
  MULTI-FRAME animation (per-frame delay/disposal compositing with
  transparency; n_frames reported from the real frame count —
  multimodal/gif.py), interlaced rasters (Appendix-E 4-pass
  de-interleave);
- **video/MP4**: REAL container parse (multimodal/mp4.py, ISO/IEC
  14496-12): box-tree walk -> brand, track dims, frame count, fps,
  duration, and the stco x stsc x stsz seek table resolving every frame
  to a (byte offset, length) range read — what frame sampling actually
  needs at scale; frame PAYLOAD decode (H.264 et al.) stays behind the
  stub tier, clearly marked (codec work needs codec libs);
- **remaining compressed formats (arithmetic-coded JPEG...)**:
  STUBBED with a deterministic content-hash fake behind a ``try: import
  PIL`` hook — the decode libs are not in this container; swapping the
  stub for a real decoder changes ONE function (``_decode``), the Spark
  plumbing is identical.

Scale notes: media bytes never pass through a Python row loop — Arrow
batches via mapInPandas; ``spark.sql.files.maxPartitionBytes`` (and at write
time, target file sizing) keeps per-task memory bounded when media blobs are
large; metadata-only operations project away the binary column first so the
columnar scan never materializes bytes.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from serene_spark.materialize import materialize

MEDIA_SCHEMA = "media_id long, kind string, media binary"
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, width long, height long, "
    "n_frames long, channels long, sample_rate long, duration_sec double, "
    "rms double, zero_cross_rate double, decoder string"
)


# -- real encoders for the synthetic corpus ----------------------------------


def make_wav(seed: int, sample_rate: int = 8000, n_frames: int = 2000) -> bytes:
    """A real 16-bit mono WAV: deterministic sine, frequency keyed by seed."""
    freq = 200 + (seed % 32) * 25
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_ppm(seed: int, width: int = 32, height: int = 24) -> bytes:
    """A real binary PPM (P6): deterministic per-pixel gradient."""
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    r = ((x + seed) % 256).astype(np.uint8) * np.ones((height, 1), np.uint8)
    g = ((y * 3 + seed) % 256).astype(np.uint8) * np.ones((1, width), np.uint8)
    b = np.full((height, width), seed % 256, np.uint8)
    img = np.stack([r, g, b], axis=-1)
    return f"P6\n{width} {height}\n255\n".encode() + img.tobytes()


def make_fake_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Synthetic media corpus: REAL WAVs and real images rotating through
    the three decodable containers (PPM, PNG, baseline JPEG — same pixel
    generator, so the format tiers are all exercised on every run);
    hash-blob 'video' for the stub tier."""
    from serene_spark.multimodal.jpeg import make_jpeg

    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            ppm = make_ppm(i)
            fmt = (i // 3) % 4
            if fmt == 1:
                blob = make_png(decode_ppm(ppm))
            elif fmt == 2:
                blob = make_jpeg(decode_ppm(ppm), quality=95)
            elif fmt == 3:
                from serene_spark.multimodal.gif import make_gif

                # GIF is palettized: posterize the same pixels to the
                # web-safe 6-level cube (<= 216 colors), losslessly encoded
                blob = make_gif(posterize(decode_ppm(ppm)))
            else:
                blob = ppm
        elif kind == "audio":
            blob = make_wav(i)
        else:
            # real ISO-BMFF container for the parse tier; every third video
            # row stays an opaque hash blob so the stub tier is exercised
            if (i // 3) % 3 == 2:
                blob = hashlib.sha256(str(i).encode()).digest() * (4 + i % 7)
            else:
                from serene_spark.multimodal.mp4 import make_mp4

                blob = make_mp4(i)
        rows.append((i, kind, blob))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def posterize(img: "np.ndarray") -> "np.ndarray":
    """Quantize channels to the web-safe 6-level cube (0,51,..,255): at
    most 216 colors, the palettized-container precondition."""
    return (((img.astype(np.int64) + 25) // 51) * 51).clip(0, 255).astype(np.uint8)


# -- decoders ----------------------------------------------------------------


def decode_ppm(blob: bytes) -> np.ndarray:
    """Parse a binary PNM raster — P6 PPM (RGB) or P5 PGM (grayscale,
    replicated to RGB) — into an (h, w, 3) uint8 array, honoring maxval
    (1-byte samples below 256, 2-byte big-endian above, PNM spec)."""
    if blob[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    nch = 3 if blob[:2] == b"P6" else 1
    parts: list[bytes] = []
    pos = 2
    while len(parts) < 3:  # width, height, maxval; '#' comments allowed
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            pos = blob.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(blob) and not blob[end : end + 1].isspace():
            end += 1
        parts.append(blob[pos:end])
        pos = end
    pos += 1  # single whitespace after maxval
    w, h = int(parts[0]), int(parts[1])
    maxval = int(parts[2])
    if not 1 <= maxval <= 65535:
        raise ValueError(f"bad PPM maxval {maxval}")
    if maxval >= 256:  # PNM spec: 2-byte big-endian samples
        px = np.frombuffer(blob, ">u2", count=w * h * nch, offset=pos)
        px = px.astype(np.uint32)
    else:
        px = np.frombuffer(blob, np.uint8, count=w * h * nch, offset=pos)
        if maxval == 255 and nch == 3:
            return px.reshape(h, w, 3)
        px = px.astype(np.uint32)
    # non-255 maxval: rescale to the 8-bit pipeline (silently treating
    # maxval as 255 was a wrong-pixels bug — 16-bit P6 exists in the wild)
    if maxval != 255:
        px = (px * 255 + maxval // 2) // maxval
    px = px.astype(np.uint8).reshape(h, w, nch)
    return np.repeat(px, 3, axis=2) if nch == 1 else px


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Decode-tier dimension bound: a hostile 70-byte header can declare a
# multi-gigabyte raster (decompression-bomb shape) and the decoders
# allocate the canvas BEFORE reading pixel data. 2^26 pixels (~67 MP,
# 192 MB RGB) is far above any legitimate crawl image and small enough
# that one bad blob cannot OOM an executor.
MAX_PIXELS = 1 << 26

# Animated-GIF composite bound: decode_gif_animation materializes one
# full-canvas composite PER FRAME, so the per-image MAX_PIXELS cap alone
# still lets a few-KB blob (max-size canvas + thousands of 1x1 frames)
# demand n_frames x canvas bytes — the one bomb member the per-image
# guard misses. 2^28 total composite pixels (~768 MB RGB worst case)
# bounds the whole animation.
MAX_ANIMATION_PIXELS = 1 << 28


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible image dimensions {w}x{h}")


def make_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real 8-bit RGB PNG (stdlib
    zlib, filter type 0 per row) — the test-side twin of ``decode_png``.
    ``interlace`` writes the Adam7 layout: seven independently-filtered
    sub-images in pass order (PNG spec 4.5.2)."""
    import struct
    import zlib

    h, w = img.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(b"".join(b"\x00" + sub[y].tobytes()
                                  for y in range(sub.shape[0])))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _png_wrap(w: int, h: int, depth: int, ctype: int, interlace: int,
              raw: bytes, plte: bytes | None = None) -> bytes:
    """Assemble a PNG from already-filtered scanline bytes."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    out = PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def make_png_palette(img: np.ndarray, depth: int = 8) -> bytes:
    """Encode an (h, w, 3) uint8 array as an indexed-color (type 3) PNG
    at ``depth`` bits per index (1/2/4/8) — the web's icon/logo shape;
    the image must have <= 2**depth unique colors."""
    h, w = img.shape[:2]
    colors, inverse = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 1 << depth:
        raise ValueError(f"more than {1 << depth} colors for depth {depth}")
    idx = inverse.reshape(h, w).astype(np.uint8)
    rows = []
    for y in range(h):
        if depth == 8:
            rows.append(b"\x00" + idx[y].tobytes())
        else:  # pack MSB-first bit groups (PNG spec 7.2)
            bits = ((idx[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1)
            rows.append(b"\x00" + np.packbits(bits.astype(np.uint8).ravel()).tobytes())
    return _png_wrap(w, h, depth, 3, 0, b"".join(rows), colors.tobytes())


def make_png16(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a 16-bit RGB PNG whose sample
    high bytes are the pixel values (low bytes deliberately non-zero, so
    a decoder that reads the wrong byte turns visibly wrong)."""
    h, w = img.shape[:2]
    samples = np.zeros((h, w, 3, 2), np.uint8)
    samples[..., 0] = img
    samples[..., 1] = img ^ 0xA5  # junk low byte
    raw = b"".join(b"\x00" + samples[y].tobytes() for y in range(h))
    return _png_wrap(w, h, 16, 2, 0, raw)


def make_png_gray_alpha(gray: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 gray array as an 8-bit gray+alpha (type 4)
    PNG with a constant opaque alpha channel."""
    h, w = gray.shape[:2]
    ga = np.stack([gray, np.full_like(gray, 255)], axis=-1)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    return _png_wrap(w, h, 8, 4, 0, raw)


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec 4.5.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, stride: int, ph: int, bpp: int, offset: int):
    """Reconstruct ``ph`` filtered rows of ``stride`` BYTES each starting
    at ``offset`` in the inflated stream; ``bpp`` is the filter's
    left-neighbor distance in bytes (PNG spec 9.2: max(1, channels x
    depth / 8)). Returns (byte rows, next_offset)."""
    out = np.zeros((ph, stride), dtype=np.uint8)
    for y in range(ph):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, np.uint8, count=stride,
                            offset=base + 1).astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:     # Up
            cur = (row + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                if ftype == 1:
                    cur[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out, offset + ph * (stride + 1)


def _png_subimage(raw, pw, ph, depth, nch, offset):
    """One (sub-)image -> (ph, pw, nch) CHANNEL-VALUE array (uint8;
    16-bit samples keep their high byte, sub-byte samples are unpacked
    MSB-first, PNG spec 7.2) plus the next stream offset."""
    stride = -(-pw * nch * depth // 8)
    bpp = max(1, nch * depth // 8)
    rows, offset = _png_unfilter(raw, stride, ph, bpp, offset)
    if depth == 8:
        px = rows[:, : pw * nch].reshape(ph, pw, nch)
    elif depth == 16:
        px = rows[:, : pw * nch * 2 : 2].reshape(ph, pw, nch)  # high bytes
    else:  # 1 / 2 / 4-bit: unpack MSB-first bit groups
        bits = np.unpackbits(rows, axis=1)
        groups = bits[:, : (stride * 8 // depth) * depth]
        vals = groups.reshape(ph, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        px = (vals * weights).sum(axis=2).astype(np.uint8)[:, : pw * nch]
        px = px.reshape(ph, pw, nch)
    return px, offset


def decode_png(blob: bytes) -> np.ndarray:
    """REAL PNG decode with the stdlib only: IHDR parse, IDAT concat +
    zlib inflate, per-row filter reconstruction (types 0-4, the complete
    spec set), normalized to an (h, w, 3) uint8 array (alpha dropped,
    gray replicated/rescaled, palette resolved via PLTE, 16-bit samples
    kept at their high byte).  Supports every spec color type (0 gray,
    2 RGB, 3 palette at depths 1/2/4/8, 4 gray+alpha, 6 RGBA) at depths
    up to 16, non-interlaced OR Adam7-interlaced (each of the 7 passes is
    an independently-filtered sub-image scattered onto the pass grid,
    PNG spec 4.5.2); malformed combinations raise (the PIL hook in
    ``_decode`` remains the fallback tier)."""
    import struct
    import zlib

    if not blob.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat = len(PNG_SIG), []
    plte = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(blob):
        (length,), tag = struct.unpack(">I", blob[pos:pos + 4]), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if (ctype not in valid_depths or depth not in valid_depths[ctype]
            or interlace not in (0, 1) or (ctype == 3 and plte is None)):
        raise ValueError(f"unsupported PNG shape (depth={depth}, color={ctype}, "
                         f"interlace={interlace}) — use the PIL tier")
    _check_dims(w, h)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    # bounded inflate: the filtered byte count is computable from the
    # header, so a zlib bomb cannot expand past it (+1 detects excess)
    if interlace == 0:
        expected = h * (-(-w * nch * depth // 8) + 1)
    else:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw and ph:
                expected += ph * (-(-pw * nch * depth // 8) + 1)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError("inflated PNG data exceeds the declared raster")
    if interlace == 0:
        px, _ = _png_subimage(raw, w, h, depth, nch, 0)
    else:
        px = np.zeros((h, w, nch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no bytes (spec 4.5.2)
            sub, offset = _png_subimage(raw, pw, ph, depth, nch, offset)
            px[y0::dy, x0::dx] = sub
    if ctype == 3:
        if int(px[:, :, 0].max()) >= len(plte):
            # an index past the PLTE must raise the decoder's documented
            # error type, not a numpy IndexError
            raise ValueError("palette index out of range")
        return plte[px[:, :, 0]]
    if ctype in (0, 4):
        g = px[:, :, 0]
        if depth < 8:  # rescale sub-byte gray to full range (spec 7.2)
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return px[:, :, :3]  # RGB, or RGBA with alpha dropped


def decode_image(blob: bytes) -> np.ndarray | None:
    """Pixels for any REAL-decodable image format (P6 PPM, PNG, baseline
    or progressive JPEG, or GIF — first presented frame for animated
    streams), else None — the single
    dispatch the pixel operators share. Malformed or unsupported-shape
    blobs (truncated or malformed streams) return None
    rather than raising: the pixel operators' contract is
    SKIP-undecodable, and an exception inside an Arrow UDF would fail
    the whole task."""
    try:
        if blob[:2] in (b"P6", b"P5"):
            return decode_ppm(blob)
        if blob.startswith(PNG_SIG):
            return decode_png(blob)
        if blob.startswith(b"\xff\xd8"):
            from serene_spark.multimodal.jpeg import decode_jpeg

            return decode_jpeg(blob)
        if blob.startswith(b"GIF8"):
            from serene_spark.multimodal.gif import decode_gif

            return decode_gif(blob)
    except Exception:
        return None
    return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resize via numpy index mapping (no loops)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


def decode_wav(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib WAV decode → (channels, sample_rate, n_frames, float waveform)."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        channels, width, rate, n = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        pcm = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 3:
        # 24-bit: 3-byte little-endian signed samples — reading these
        # through the 4-byte branch silently produced len//4 wrong values
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v >= (1 << 23)) * (1 << 24)  # sign extension
        pcm = v.astype(np.float64) / 8388608.0
    else:
        pcm = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    return channels, rate, n, pcm


_NULLS = (0, 0, 0, 0, 0, 0.0, 0.0, 0.0)


def _decode(kind: str, blob: bytes):
    """One media blob → (width, height, n_frames, channels, sample_rate,
    duration, rms, zcr, decoder). Real paths first; hash stub as fallback."""
    if kind == "image" and blob[:2] in (b"P6", b"P5"):
        try:
            img = decode_ppm(blob)
            h, w = img.shape[:2]
            return (w, h, 1) + _NULLS[3:] + ("ppm",)
        except Exception:
            # truncated/garbled P6 header or short body — stub tier,
            # never fail the Arrow task (same guard as every other
            # branch; found by the garbage property test)
            pass
    if kind == "image" and blob.startswith(PNG_SIG):
        try:
            img = decode_png(blob)
            h, w = img.shape[:2]
            return (w, h, 1) + _NULLS[3:] + ("png",)
        except Exception:
            # exotic shape raises ValueError, but CORRUPT bodies raise
            # zlib.error / struct.error / IndexError — all must fall
            # through to the PIL tier / deterministic stub, never fail
            # the Arrow task
            pass
    stub_tag = "stub"
    if kind == "image" and blob.startswith(b"GIF8"):
        try:
            from serene_spark.multimodal.gif import decode_gif_animation

            frames, _delays, _disp = decode_gif_animation(blob)
            h, w = frames[0].shape[:2]
            return (w, h, len(frames)) + _NULLS[3:] + ("gif",)
        except Exception:
            # corrupt bodies raise — fall through to the PIL tier / stub
            pass
    if kind == "image" and blob.startswith(b"\xff\xd8"):
        try:
            from serene_spark.multimodal.jpeg import UnsupportedJpeg, decode_jpeg

            img = decode_jpeg(blob)
            h, w = img.shape[:2]
            return (w, h, 1) + _NULLS[3:] + ("jpeg",)
        except UnsupportedJpeg:
            # well-formed arithmetic/12-bit/hierarchical stream: fall to
            # the PIL tier / stub, but with a DISTINCT tag so the stub
            # rate for real-but-undecodable JPEGs is countable in the
            # feature table (vs corrupt bytes, which stay plain "stub")
            stub_tag = "jpeg-stub"
        except Exception:
            pass
    if kind == "audio" and blob.startswith(b"RIFF"):
        try:
            channels, rate, n, pcm = decode_wav(blob)
            rms = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
            zcr = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if len(pcm) > 1 else 0.0
            return (0, 0, n, channels, rate, n / rate, round(rms, 6), round(zcr, 6), "wav")
        except Exception:
            # a RIFF prefix on a non-WAV / truncated body raises
            # wave.Error (or worse) — fall to the stub, never fail the
            # Arrow task (bug found by the garbage property test: this
            # was the ONE decode branch without the guard)
            pass
    if kind == "video":
        try:
            from serene_spark.multimodal.mp4 import is_mp4, parse_mp4

            if is_mp4(blob):
                info = parse_mp4(blob)
                return (info["width"], info["height"], info["n_samples"],
                        0, 0, round(info["duration_sec"], 6), 0.0, 0.0,
                        "mp4")
        except Exception:
            # malformed containers fall through to the stub tier,
            # never fail the Arrow task
            pass
    try:  # pragma: no cover - compressed-format libs absent in this container
        if kind == "image":
            from PIL import Image

            img = Image.open(io.BytesIO(blob))
            return (img.width, img.height, 1) + _NULLS[3:] + ("pil",)
    except Exception:
        pass
    # STUB tier: deterministic pseudo-dimensions from the content hash
    h = hashlib.sha256(blob).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    return (width, height, n_frames) + _NULLS[3:] + (stub_tag,)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media (mapInPandas)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media"]]
            feats = [_decode(k, b) for k, b in zip(pdf["kind"], blobs)]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in blobs],
                    "sha256": [hashlib.sha256(b).hexdigest() for b in blobs],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "channels": [f[3] for f in feats],
                    "sample_rate": [f[4] for f in feats],
                    "duration_sec": [f[5] for f in feats],
                    "rms": [f[6] for f in feats],
                    "zero_cross_rate": [f[7] for f in feats],
                    "decoder": [f[8] for f in feats],
                }
            )

    return media.mapInPandas(fe, FEATURE_SCHEMA)


THUMB_SCHEMA = "media_id long, thumb_w long, thumb_h long, mean_r double, mean_g double, mean_b double"


def image_thumbnails(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Real image transform: decode (PPM or PNG) → nearest-neighbor resize
    → mean channel features, Arrow-batched; undecodable images are skipped
    (the stub tier has no pixels to resize)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "thumb_w", "thumb_h", "mean_r", "mean_g", "mean_b")}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
                blob = bytes(blob)
                img = decode_image(blob) if kind == "image" else None
                if img is None:
                    continue
                thumb = resize_nearest(img, out_w, out_h).astype(np.float64)
                out["media_id"].append(mid)
                out["thumb_w"].append(out_w)
                out["thumb_h"].append(out_h)
                for i, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[ch].append(round(float(thumb[:, :, i].mean()), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(fe, THUMB_SCHEMA)


def sample_frames(features: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame-sampling plan shape: one row per sampled frame index (pure
    DataFrame op — explode over a sequence, no Python)."""
    from pyspark.sql import functions as F

    return features.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.lit(0), (F.col("n_frames") - 1)), F.lit(every_k))
        ).alias("frame_idx"),
    )


AHASH_SCHEMA = "media_id long, ahash long, w0 int, w1 int, w2 int, w3 int"


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash over decodable images: 8x8 grayscale
    thumbnail, bit i set iff pixel i > mean — the standard aHash. Emitted
    alongside its four 16-bit words so near-dup candidate generation is an
    equi-join per word (the SimHash pigeonhole layout, operators/dedup.py:
    any pair within Hamming distance 3 shares at least one exact word).
    Arrow-batched; undecodable blobs are skipped (no pixels in the stub
    tier). PNG and PPM content with identical pixels hashes identically —
    the format never leaks into the signature (pinned in
    tests/test_multimodal.py).
    """

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "ahash", "w0", "w1", "w2", "w3")}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
                blob = bytes(blob)
                img = decode_image(blob) if kind == "image" else None
                if img is None:
                    continue
                gray = resize_nearest(img, 8, 8).astype(np.float64).mean(axis=2)
                bits = (gray > gray.mean()).astype(np.uint64).ravel()
                h = 0
                for b in bits:  # row-major, MSB-first: deterministic layout
                    h = (h << 1) | int(b)
                out["media_id"].append(mid)
                out["ahash"].append(h - (1 << 64) if h >= (1 << 63) else h)
                for w in range(4):
                    out[f"w{w}"].append((h >> (16 * w)) & 0xFFFF)
            yield pd.DataFrame(out)

    return media.mapInPandas(fe, AHASH_SCHEMA)


def _pigeonhole_pairs(sigs: DataFrame, hash_col: str, max_hamming: int) -> DataFrame:
    """Shared pigeonhole near-dup pairing over a (media_id, <hash>, w0..w3)
    signature frame: one equi-join per 16-bit word — candidates only ever
    meet inside a shared word bucket, never all-pairs — then exact popcount
    verify.  The 4-word pigeonhole guarantees completeness only for Hamming
    distance <= 3 (<= 3 flipped bits -> one word exact); larger bounds
    would silently drop true pairs, so they are rejected."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-word pigeonhole "
            "completeness bound (3); use more/smaller words for wider radii"
        )
    from pyspark.sql import functions as F

    sigs = sigs.transform(materialize)
    pairs = None
    for w in range(4):
        a = sigs.select(
            F.col("media_id").alias("id_a"), F.col(hash_col).alias("ha"), F.col(f"w{w}").alias("wk")
        )
        b = sigs.select(
            F.col("media_id").alias("id_b"), F.col(hash_col).alias("hb"), F.col(f"w{w}").alias("wk")
        )
        cand = a.join(b, "wk").filter(F.col("id_a") < F.col("id_b")).drop("wk")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    return (
        pairs.distinct()
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs: aHash signatures through the shared
    pigeonhole candidate join + exact popcount verify."""
    return _pigeonhole_pairs(image_ahash(media), "ahash", max_hamming)


AUDIO_FP_SCHEMA = "media_id long, afp long, w0 int, w1 int, w2 int, w3 int"
_AFP_BINS = 64


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """64-bit spectral fingerprint over decodable WAVs: magnitude spectrum
    (rfft) pooled into 64 log-spaced bins, bit i set iff bin i's energy >
    the MEAN bin energy — amplitude-scale-invariant by construction (every
    bin scales together), frequency-selective (a tone lights the bins
    around it), the cheap Haitsma–Kalker-style robust hash.  Mean, not
    median: a median threshold forces half the bins high, so on tonal
    material the noise-floor bins sit exactly at the cut and re-encode
    quantization flips them; the mean is dominated by the energetic bins
    and the floor stays stably below it.  Emitted
    with the four 16-bit words for the pigeonhole join, exactly the image
    aHash layout.  Arrow-batched mapInPandas; non-RIFF blobs (the
    compressed-format stub tier) are skipped."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "afp", "w0", "w1", "w2", "w3")}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
                blob = bytes(blob)
                if kind != "audio" or not blob.startswith(b"RIFF"):
                    continue
                try:
                    _, rate, _, pcm = decode_wav(blob)
                except Exception:
                    continue  # RIFF prefix on a non-WAV body: skip, never
                              # fail the Arrow task (same guard as _decode)
                if len(pcm) < 2 * _AFP_BINS:
                    continue
                mag = np.abs(np.fft.rfft(pcm))
                # log-spaced bin edges over [1, len(mag)) — mean-pool each
                edges = np.unique(
                    np.geomspace(1, len(mag) - 1, _AFP_BINS + 1).astype(np.int64)
                )
                pooled = np.zeros(_AFP_BINS)
                for i in range(min(_AFP_BINS, len(edges) - 1)):
                    lo, hi = edges[i], max(edges[i] + 1, edges[i + 1])
                    pooled[i] = mag[lo:hi].mean()
                bits = (pooled > pooled.mean()).astype(np.uint64)
                h = 0
                for b in bits:  # bin-major, MSB-first: deterministic layout
                    h = (h << 1) | int(b)
                out["media_id"].append(mid)
                out["afp"].append(h - (1 << 64) if h >= (1 << 63) else h)
                for w in range(4):
                    out[f"w{w}"].append((h >> (16 * w)) & 0xFFFF)
            yield pd.DataFrame(out)

    return media.mapInPandas(fe, AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate audio pairs: spectral fingerprints through the shared
    pigeonhole candidate join + exact popcount verify — re-encoded or
    amplitude-scaled copies collide, different tones stay apart."""
    return _pigeonhole_pairs(audio_fingerprint(media), "afp", max_hamming)


# -- registered query surface --------------------------------------------------
#
# The media corpus is generated in-engine (the sf parquet tables carry no
# binary columns), so these are rows-only queries: deterministic row
# counts/schemas/values per seed, no DuckDB oracle — the pixel/PCM-level
# correctness is pinned numerically in tests/test_multimodal.py instead
# (PNG/JPEG vs their lossless PPM twins, WAV vs closed-form RMS/ZCR).

from serene_spark.registry import register

_MEDIA_N = 64


def _media(spark: SparkSession) -> DataFrame:
    return make_fake_media(spark, _MEDIA_N)


@register(
    "media_features",
    oracle=None,  # in-engine binary corpus — not expressible over sf parquet
    doc="multimodal feature extraction over opaque binary media columns: "
    "REAL decode tiers (WAV PCM stats; PPM/PNG/baseline-JPEG dimensions) "
    "+ deterministic stub for undecodable containers; Arrow-batched "
    "mapInPandas, media bytes never cross a Python row loop",
)
def media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(_media(spark)).orderBy("media_id")


@register(
    "media_image_ahash",
    oracle=None,
    doc="perceptual average-hash (8x8 grayscale thumbnail) over every "
    "decodable image with its four 16-bit pigeonhole words — identical "
    "pixels hash identically across PPM/PNG/JPEG containers",
)
def media_image_ahash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_ahash(_media(spark)).orderBy("media_id")


@register(
    "media_image_near_dups",
    oracle=None,
    doc="near-duplicate image pairs: aHash -> per-16-bit-word pigeonhole "
    "equi-join (complete for Hamming<=3, never all-pairs) -> exact "
    "popcount verify",
)
def media_image_near_dups_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_near_dup_pairs(_media(spark)).orderBy("id_a", "id_b")


@register(
    "media_audio_fingerprint",
    oracle=None,
    doc="64-bit spectral fingerprint over decodable WAVs (rfft magnitude "
    "pooled into 64 log-spaced bins, bit = bin energy > mean) with "
    "pigeonhole words — amplitude-scale-invariant robust hash",
)
def media_audio_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_fingerprint(_media(spark)).orderBy("media_id")


@register(
    "media_frame_samples",
    oracle=None,
    doc="frame-sampling plan over media features: one row per sampled "
    "frame index (explode over sequence, no Python)",
)
def media_frame_samples_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(
        extract_media_features(_media(spark)), every_k=8
    ).orderBy("media_id", "frame_idx")


FRAME_RANGE_SCHEMA = (
    "media_id long, frame_idx long, byte_offset long, byte_len long, "
    "pts_sec double"
)

FRAME_SAMPLE_EVERY_K = 8


def frame_ranges(media: DataFrame, every_k: int = FRAME_SAMPLE_EVERY_K) -> DataFrame:
    """The production frame-sampling artifact: for every parseable video
    container, the (byte offset, byte length, presentation time) of each
    sampled frame — resolved from the stco x stsc x stsz seek table, so a
    downstream worker fetches sampled frames as RANGE READS against object
    storage without demuxing or downloading the file.  Arrow-batched; the
    container bytes never cross a Python row loop."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from serene_spark.multimodal.mp4 import is_mp4, parse_mp4

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "byte_offset",
                                   "byte_len", "pts_sec")}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
                blob = bytes(blob)
                if kind != "video" or not is_mp4(blob):
                    continue
                try:
                    info = parse_mp4(blob)
                except Exception:
                    continue
                n = info["n_samples"]
                spf = info["duration_sec"] / n if n else 0.0
                for idx in range(0, n, every_k):
                    off, sz = info["samples"][idx]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["byte_offset"].append(off)
                    out["byte_len"].append(sz)
                    out["pts_sec"].append(round(idx * spf, 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(fe, FRAME_RANGE_SCHEMA)


@register(
    "media_frame_ranges",
    oracle=None,
    doc="video frame-sampling SEEK PLAN: every k-th frame of each parseable "
    "MP4 resolved to its (byte offset, length, pts) via the real container "
    "sample tables — downstream fetch = range reads, no demux/download",
)
def media_frame_ranges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_ranges(_media(spark)).orderBy("media_id", "frame_idx")
