"""GIF87a/89a codec — stdlib-only LZW, the fourth REAL image tier.

Same honest-tier policy as multimodal/jpeg.py: ``make_gif`` /
``make_gif_animated`` are the test-construction encoders (palette
quantization + LZW compression, Graphic Control Extensions with delay /
disposal / transparency, Netscape loop block), ``decode_gif`` /
``decode_gif_animation`` the real decoders (logical screen descriptor,
global/local color tables, extension blocks, variable-code-width LZW
with clear/EOI handling, non-interlaced AND interlaced rasters (the
4-pass row schedule of GIF89a Appendix E), and full multi-frame
compositing per the GIF89a disposal semantics: 0/1 leave, 2 restore
background, 3 restore previous, with transparent-index carry-through).

Reference: GIF89a specification (CompuServe, 1990), Appendix F (LZW);
disposal-method compositing per section 23 (Graphic Control Extension).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """LZW-compress an index stream (GIF89a Appendix F), 12-bit cap."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = [clear]
    dict_ = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    seq: tuple[int, ...] = ()
    widths: list[int] = [width]  # code width AT EMIT TIME for each code

    def emit(code: int) -> None:
        codes.append(code)
        widths.append(width)

    for idx in indices:
        cand = seq + (idx,)
        if cand in dict_:
            seq = cand
            continue
        emit(dict_[seq])
        dict_[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            emit(clear)
            dict_ = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (idx,)
    if seq:
        emit(dict_[seq])
    # EOI width must match the DECODER's schedule: the decoder adds one
    # entry for the final flushed code and bumps on next_code >= 2^width
    # (its >= rule), while the encoder's own > check only runs on entry
    # adds — when next_code lands EXACTLY on 2^width here, the decoder
    # reads EOI one bit wider than a naive encoder writes it (hit in
    # practice at depth 4 with 238 dictionary entries: next_code 256).
    if next_code >= (1 << width) and width < 12:
        width += 1
    emit(eoi)

    bits = bytearray()
    acc, nbits = 0, 0
    for code, cw in zip(codes, widths):
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _lzw_decode(
    data: bytes, min_code: int, max_out: int | None = None
) -> list[int]:
    """Inverse of ``_lzw_encode`` including the KwKwK case.

    ``max_out`` bounds the decoded index count BEFORE the list is built:
    LZW expands up to ~4000x, so a ~1 MB hostile stream can otherwise
    materialize gigabytes before the caller's ``len(out) == w*h`` check
    ever runs. Decoders pass the raster size they expect."""
    if not 2 <= min_code <= 11:
        # GIF caps code width at 12 bits (min_code + 1 <= 12); a hostile
        # byte of e.g. 255 would otherwise build a 2^255-entry base dict
        raise ValueError(f"invalid LZW minimum code size {min_code}")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = {i: (i,) for i in range(1 << min_code)}
    dict_ = dict(base)
    next_code = eoi + 1
    width = min_code + 1
    acc, nbits, dpos = 0, 0, 0
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    while True:
        while nbits < width:
            if dpos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[dpos] << nbits
            nbits += 8
            dpos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = dict(base)
            next_code = eoi + 1
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in dict_:
                raise ValueError("corrupt LZW code")
            entry = dict_[code]
        elif code in dict_:
            entry = dict_[code]
            dict_[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + (prev[0],)
            dict_[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt LZW code")
        if max_out is not None and len(out) + len(entry) > max_out:
            raise ValueError("LZW output exceeds declared raster size")
        out.extend(entry)
        prev = entry
        if next_code >= (1 << width) and width < 12:
            width += 1
    return out


def _interlace_order(h: int) -> list[int]:
    """GIF89a Appendix E 4-pass row schedule: the order image rows are
    STORED in an interlaced raster (pass 1: rows 0,8,16...; pass 2:
    4,12...; pass 3: 2,6,10...; pass 4: odd rows)."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _palette(pixels: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(power-of-two padded table, depth, n_real_colors) of an (n, 3)
    pixel array."""
    colors = np.unique(pixels, axis=0)
    if len(colors) > 256:
        raise ValueError("make_gif: more than 256 unique colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    return table, depth, len(colors)


def make_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a single-frame GIF89a.

    Palette: the image's unique colors (must be <= 256 — test images are
    constructed, not photographic), padded to a power of two.
    ``interlace`` stores rows in the 4-pass Appendix-E schedule and sets
    the image descriptor's interlace flag."""
    h, w = img.shape[:2]
    table, depth, n_colors = _palette(img.reshape(-1, 3))
    inverse = _map_to_palette(img, table[:n_colors])
    if interlace:
        inverse = inverse[_interlace_order(h)]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])  # GCT flag
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])  # image descriptor flags

    min_code = max(2, depth)
    out += bytes([min_code])
    out += _sub_blocks(_lzw_encode(inverse.ravel().tolist(), min_code))
    out += b"\x3b"  # trailer
    return bytes(out)


def _map_to_palette(img: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """(h, w) palette indices for pixels that are exact palette members."""
    flat = img.reshape(-1, 3).astype(np.int64)
    keys = flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]
    pk = (colors[:, 0].astype(np.int64) * 65536
          + colors[:, 1].astype(np.int64) * 256 + colors[:, 2])
    order = np.argsort(pk)
    hit = np.searchsorted(pk[order], keys)
    if not np.all(pk[order][hit] == keys):
        raise ValueError("pixel not in palette")
    return order[hit].reshape(img.shape[:2])


def make_gif_animated(
    frames: list[np.ndarray],
    delays_cs: list[int] | None = None,
    disposals: list[int] | None = None,
    rects: list[tuple[int, int]] | None = None,
    transparent: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode a multi-frame GIF89a — the construction twin of
    ``decode_gif_animation``.

    ``frames[0]`` sets the canvas size; later frames may be smaller
    sub-rects placed at ``rects[i]`` (default (0, 0)). Each frame gets a
    Graphic Control Extension carrying ``delays_cs[i]`` (centiseconds,
    default 10) and ``disposals[i]`` (0-3, default 0). If ``transparent``
    is given, pixels of exactly that RGB value encode as the transparent
    index — the decoder must leave the underlying canvas visible there.
    A Netscape loop extension is always emitted (real-world animated
    GIFs carry one; it exercises the application-extension skip path)."""
    if not frames:
        raise ValueError("no frames")
    sh, sw = frames[0].shape[:2]
    delays_cs = delays_cs or [10] * len(frames)
    disposals = disposals or [0] * len(frames)
    rects = rects or [(0, 0)] * len(frames)

    pixels = np.concatenate([f.reshape(-1, 3) for f in frames])
    if transparent is not None:
        pixels = np.concatenate(
            [pixels, np.asarray([transparent], dtype=np.uint8)])
    table, depth, n_colors = _palette(pixels)
    tindex = (
        int(_map_to_palette(
            np.asarray([[transparent]], dtype=np.uint8), table[:n_colors]
        )[0, 0])
        if transparent is not None
        else 0
    )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += table.tobytes()
    # Netscape 2.0 loop-forever application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code = max(2, depth)
    for frame, delay, disposal, (left, top) in zip(
        frames, delays_cs, disposals, rects
    ):
        h, w = frame.shape[:2]
        tflag = 1 if transparent is not None else 0
        gce = struct.pack(
            "<BHB", ((disposal & 7) << 2) | tflag, delay,
            tindex if tflag else 0,
        )
        out += b"\x21\xf9\x04" + gce + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
        idx = _map_to_palette(frame, table[:n_colors])
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(idx.ravel().tolist(), min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif_animation(
    blob: bytes,
) -> tuple[list[np.ndarray], list[int], list[int]]:
    """Decode every frame of a (possibly animated) GIF.

    Returns ``(frames, delays_cs, disposals)`` where each frame is the
    full-canvas (sh, sw, 3) uint8 COMPOSITE presented at that point of
    the animation: transparent pixels keep the underlying canvas, and
    between frames the canvas follows the previous frame's disposal
    method (0/1 leave, 2 restore the frame rect to background, 3 restore
    the pre-frame canvas). Unknown/reserved disposal codes behave as 0,
    matching browser practice.

    Bomb guards (one bad blob must not OOM an Arrow worker): canvas and
    every per-frame rect pass ``_check_dims``; total composite pixels
    (n_frames x canvas) are capped at ``MAX_ANIMATION_PIXELS``; LZW
    decode is bounded at the declared raster size before the index list
    is built."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", blob[6:10])
    from serene_spark.multimodal.binary_ops import (
        MAX_ANIMATION_PIXELS,
        _check_dims,
    )

    _check_dims(sw, sh)
    # One composite per frame: bound frames x canvas, not just canvas —
    # a max-canvas GIF with thousands of 1x1 frames is a memory bomb.
    max_frames = max(1, MAX_ANIMATION_PIXELS // (sw * sh))
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    disposals: list[int] = []
    # GCE state for the NEXT image descriptor (one-shot per spec)
    g_disposal, g_delay, g_tindex = 0, 0, None
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = blob[pos + 1]
            pos += 2
            payload = bytearray()
            while blob[pos]:
                ln = blob[pos]
                payload += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(payload) >= 4:  # Graphic Control
                gp, g_delay = payload[0], struct.unpack(
                    "<H", bytes(payload[1:3]))[0]
                g_disposal = (gp >> 2) & 0x07
                g_tindex = payload[3] if gp & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        left, top, w, h = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
        _check_dims(w, h)
        if left + w > sw or top + h > sh:
            # spec: frames lie within the logical screen; a rect past it
            # must raise the documented error type, not a numpy
            # shape-mismatch IndexError at the composite assignment
            raise ValueError("frame rect outside canvas")
        if len(frames) >= max_frames:
            raise ValueError(
                f"animation exceeds {MAX_ANIMATION_PIXELS} composite pixels"
            )
        ipacked = blob[pos + 9]
        pos += 10
        interlaced = bool(ipacked & 0x40)
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("no color table")

        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        out = _lzw_decode(bytes(data), min_code, max_out=w * h)
        if len(out) != w * h:
            raise ValueError("LZW output size mismatch")
        idx = np.asarray(out, dtype=np.int64).reshape(h, w)
        if idx.max() >= len(table):
            raise ValueError("palette index out of range")
        if interlaced:  # stored rows are in 4-pass order; un-shuffle
            deinterlaced = np.empty_like(idx)
            deinterlaced[_interlace_order(h)] = idx
            idx = deinterlaced

        saved = canvas.copy() if g_disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        mask = (idx != g_tindex) if g_tindex is not None else np.ones(
            (h, w), dtype=bool)
        region[mask] = table[idx][mask]
        frames.append(canvas.copy())
        delays.append(g_delay)
        disposals.append(g_disposal)
        if g_disposal == 2:  # restore frame rect to background
            canvas[top : top + h, left : left + w] = 0
        elif g_disposal == 3:  # restore to pre-frame canvas
            canvas = saved
        g_disposal, g_delay, g_tindex = 0, 0, None
    if not frames:
        raise ValueError("no image data")
    return frames, delays, disposals


def decode_gif(blob: bytes) -> np.ndarray:
    """First presented frame of a GIF as (h, w, 3) uint8
    (for animated streams: the full-canvas composite of frame 0 — the
    conventional still-thumbnail semantics)."""
    return decode_gif_animation(blob)[0][0]
