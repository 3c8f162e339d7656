"""Minimal ISO-BMFF (MP4) container codec — REAL box-tree parsing, no
codec decode.

What a training-data pipeline needs from video at 100 TB is almost never
the decoded pixels of every frame — it is the CONTAINER's sample tables:
``stts`` (frame timings), ``stsz`` (per-frame byte sizes), ``stco``/``stsc``
(chunk layout).  Those four tables turn "sample every k-th frame" into a
list of (byte offset, byte length) range reads against object storage —
no demux, no decode, no full-file fetch.  This module implements exactly
that tier honestly:

* ``make_mp4`` — a spec-conformant writer (ftyp + mdat + moov with the
  full mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl chain) used to construct test
  corpora, the Annex-K-encoder pattern from multimodal/jpeg.py;
* ``parse_mp4`` — a box-tree walker returning brand, movie duration,
  track dimensions, frame count, fps (from stts), and the resolved
  per-sample (offset, size) table from stco x stsc x stsz — the seek plan;
* frame PAYLOAD decode (H.264 et al.) stays behind the PIL-tier stub in
  binary_ops._decode, clearly marked: codec work needs codec libs.

Reference: ISO/IEC 14496-12 (box structure, sample table semantics).
"""

from __future__ import annotations

import struct


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def make_mp4(seed: int, n_frames: int | None = None,
             timescale: int = 12800, frame_delta: int = 512,
             width: int = 64, height: int = 48,
             mdhd_version: int = 0, audio_first: bool = False) -> bytes:
    """Deterministic minimal-but-conformant MP4: one video track with
    ``n_frames`` samples at constant ``timescale/frame_delta`` fps, frame
    payloads of varying deterministic sizes in one mdat chunk.

    ``mdhd_version=1`` writes the 64-bit mdhd layout and ``audio_first``
    prepends a minimal ``soun`` trak before the video trak — the two
    real-world container shapes the parser must not misread."""
    if n_frames is None:
        n_frames = 8 + seed % 24
    sizes = [32 + ((seed * 31 + i * 17) % 96) for i in range(n_frames)]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")

    # mdat payload: deterministic bytes per frame
    frames = b"".join(
        bytes((seed + i + j) % 256 for j in range(sz)) for i, sz in enumerate(sizes)
    )
    mdat = _box(b"mdat", frames)
    mdat_offset = len(ftyp) + 8  # first frame byte: after mdat header

    duration_ts = n_frames * frame_delta
    duration_ms = duration_ts * 1000 // timescale

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, duration_ms)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration_ms)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    if mdhd_version == 1:  # 64-bit creation/modification/duration layout
        mdhd = _full(b"mdhd", 1, 0, struct.pack(
            ">QQIQ", 0, 0, timescale, duration_ts) + struct.pack(">HH", 0x55C4, 0))
    else:
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, duration_ts) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # stsd with a minimal avc1 visual sample entry (width/height readable)
    avc1 = _box(b"avc1",
                b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dri
                + b"\x00" * 16
                + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x480000, 0x480000)
                + struct.pack(">I", 0) + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">H", 0x18) + struct.pack(">h", -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full(b"stts", 0, 0,
                 struct.pack(">I", 1) + struct.pack(">II", n_frames, frame_delta))
    stsc = _full(b"stsc", 0, 0,
                 struct.pack(">I", 1) + struct.pack(">III", 1, n_frames, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n_frames)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 1) + struct.pack(">I", mdat_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    if audio_first:
        a_mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIII", 0, 0, 44100, duration_ts) + struct.pack(">HH", 0x55C4, 0))
        a_hdlr = _full(b"hdlr", 0, 0,
                       struct.pack(">I", 0) + b"soun" + b"\x00" * 12
                       + b"SoundHandler\x00")
        a_trak = _box(b"trak", tkhd + _box(b"mdia", a_mdhd + a_hdlr))
        trak = a_trak + trak
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(blob: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", blob[pos:pos + 4])[0]
        btype = blob[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", blob[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed box")
        yield btype, body, pos + size
        pos += size


def _find(blob: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(blob, start, end):
        if t == btype:
            return b, e
    return None


def is_mp4(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[4:8] == b"ftyp"


def parse_mp4(blob: bytes) -> dict:
    """Parse the box tree: brand, duration, track dims, frame count, fps,
    and the resolved per-sample (offset, size) seek table."""
    if not is_mp4(blob):
        raise ValueError("not an ISO-BMFF file")
    ftyp = _find(blob, 0, len(blob), b"ftyp")
    brand = blob[ftyp[0]:ftyp[0] + 4].decode("ascii", "replace")
    moov = _find(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mvhd = _find(blob, *moov, b"mvhd")
    ver = blob[mvhd[0]]
    if ver == 0:
        _, _, mv_ts, mv_dur = struct.unpack(">IIII", blob[mvhd[0] + 4:mvhd[0] + 20])
    else:  # version 1: 64-bit times
        mv_ts = struct.unpack(">I", blob[mvhd[0] + 20:mvhd[0] + 24])[0]
        mv_dur = struct.unpack(">Q", blob[mvhd[0] + 24:mvhd[0] + 32])[0]

    # select the VIDEO track explicitly: real-world files often carry the
    # audio trak first, and reading visual dims out of a soun sample entry
    # would be a silent wrong answer (this module's contract forbids those)
    trak = None
    for t, b, e in _walk(blob, *moov):
        if t != b"trak":
            continue
        mdia_c = _find(blob, b, e, b"mdia")
        if mdia_c is None:
            continue
        hdlr_c = _find(blob, *mdia_c, b"hdlr")
        if hdlr_c is not None and blob[hdlr_c[0] + 8:hdlr_c[0] + 12] == b"vide":
            trak = (b, e)
            break
    if trak is None:
        raise ValueError("no video track (hdlr='vide') in moov")
    mdia = _find(blob, *trak, b"mdia")
    mdhd = _find(blob, *mdia, b"mdhd")
    md_ver = blob[mdhd[0]]
    if md_ver == 0:
        md_ts, md_dur = struct.unpack(">II", blob[mdhd[0] + 12:mdhd[0] + 20])
    elif md_ver == 1:  # 64-bit creation/modification/duration fields
        md_ts = struct.unpack(">I", blob[mdhd[0] + 20:mdhd[0] + 24])[0]
        md_dur = struct.unpack(">Q", blob[mdhd[0] + 24:mdhd[0] + 32])[0]
    else:
        raise ValueError(f"unsupported mdhd version {md_ver}")
    hdlr = _find(blob, *mdia, b"hdlr")
    handler = blob[hdlr[0] + 8:hdlr[0] + 12].decode("ascii", "replace")
    minf = _find(blob, *mdia, b"minf")
    stbl = _find(blob, *minf, b"stbl")

    stsd = _find(blob, *stbl, b"stsd")
    # first sample entry: [4 count][4 size][4 fourcc]...; visual entries
    # carry width/height at offset 24 into the entry body
    entry = stsd[0] + 8
    codec = blob[entry + 4:entry + 8].decode("ascii", "replace")
    width, height = struct.unpack(">HH", blob[entry + 32:entry + 36])

    stts = _find(blob, *stbl, b"stts")
    n_ent = struct.unpack(">I", blob[stts[0] + 4:stts[0] + 8])[0]
    total_samples, total_ticks = 0, 0
    for i in range(n_ent):
        cnt, delta = struct.unpack(
            ">II", blob[stts[0] + 8 + 8 * i:stts[0] + 16 + 8 * i])
        total_samples += cnt
        total_ticks += cnt * delta

    stsz = _find(blob, *stbl, b"stsz")
    fixed, n_sz = struct.unpack(">II", blob[stsz[0] + 4:stsz[0] + 12])
    # bomb guard: with a FIXED sample size the count is not bounded by
    # the blob's own bytes (the variable branch is — a short table makes
    # struct.unpack raise), so a hostile header could declare 2^32
    # samples and allocate a multi-GB list. 2^22 frames (~48h at 24fps)
    # is far above any legitimate container.
    if n_sz > (1 << 22):
        raise ValueError(f"implausible sample count {n_sz}")
    sizes = ([fixed] * n_sz if fixed else list(struct.unpack(
        f">{n_sz}I", blob[stsz[0] + 12:stsz[0] + 12 + 4 * n_sz])))

    stco = _find(blob, *stbl, b"stco")
    n_ch = struct.unpack(">I", blob[stco[0] + 4:stco[0] + 8])[0]
    chunk_offsets = list(struct.unpack(
        f">{n_ch}I", blob[stco[0] + 8:stco[0] + 8 + 4 * n_ch]))

    stsc = _find(blob, *stbl, b"stsc")
    n_sc = struct.unpack(">I", blob[stsc[0] + 4:stsc[0] + 8])[0]
    runs = [struct.unpack(">III", blob[stsc[0] + 8 + 12 * i:stsc[0] + 20 + 12 * i])
            for i in range(n_sc)]

    # resolve per-sample (offset, size): walk chunks, laying samples out
    samples: list[tuple[int, int]] = []
    si = 0
    for ci in range(n_ch):
        per = next(r[1] for r in reversed(runs) if r[0] <= ci + 1)
        off = chunk_offsets[ci]
        for _ in range(per):
            if si >= len(sizes):
                break
            samples.append((off, sizes[si]))
            off += sizes[si]
            si += 1

    fps = (total_samples * md_ts / total_ticks) if total_ticks else 0.0
    return {
        "brand": brand,
        "codec": codec,
        "handler": handler,
        "width": int(width),
        "height": int(height),
        "n_samples": total_samples,
        "duration_sec": md_dur / md_ts if md_ts else mv_dur / mv_ts,
        "fps": round(fps, 6),
        "samples": samples,
    }
