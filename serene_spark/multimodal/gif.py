"""GIF87a/89a codec — stdlib-only LZW, the fourth REAL image tier.

Same honest-tier policy as multimodal/jpeg.py: ``make_gif`` is the
test-construction encoder (palette quantization + LZW compression),
``decode_gif`` the real decoder (logical screen descriptor, global/local
color tables, extension-block skipping, variable-code-width LZW with
clear/EOI handling, non-interlaced rasters). Interlaced images and
animation (multiple image descriptors) raise ValueError and fall through
to binary_ops' stub tier — never a silent wrong answer.

Reference: GIF89a specification (CompuServe, 1990), Appendix F (LZW).
"""

from __future__ import annotations

import struct

import numpy as np


def make_gif(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a single-frame GIF89a.

    Palette: the image's unique colors (must be <= 256 — test images are
    constructed, not photographic), padded to a power of two."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("make_gif: more than 256 unique colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])  # GCT flag
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # image desc

    # LZW encode the index stream
    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = [clear]
    dict_ = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    seq: tuple[int, ...] = ()
    widths: list[int] = []  # code width AT EMIT TIME for each code

    def emit(code: int) -> None:
        codes.append(code)
        widths.append(width)

    widths.append(width)  # for the initial clear
    for idx in inverse.tolist():
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

    out += bytes([min_code])
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode a single-frame non-interlaced GIF to (h, w, 3) uint8."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    frames = 0
    img = None
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        frames += 1
        if frames > 1:
            raise ValueError("animated GIF: not this tier")
        left, top, w, h = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
        ipacked = blob[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise ValueError("interlaced GIF: not this tier")
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

        # LZW decode
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
            out.extend(entry)
            prev = entry
            if next_code >= (1 << width) and width < 12:
                width += 1
        if len(out) != w * h:
            raise ValueError("LZW output size mismatch")
        idx = np.asarray(out, dtype=np.int64).reshape(h, w)
        frame = table[idx]
        if (left, top, w, h) != (0, 0, sw, sh):
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            canvas[top : top + h, left : left + w] = frame
            img = canvas
        else:
            img = frame
    if img is None:
        raise ValueError("no image data")
    return img
