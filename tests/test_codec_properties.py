"""Property-based tests (hypothesis) over the pure media codecs —
random-shape/content round-trips the deterministic sweeps can't
enumerate: LZW at every code width, lossless JPEG at every predictor,
the PNG color-type matrix, and animated-GIF metadata. All pure Python
(no Spark session), bounded example counts to keep the suite's budget."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.integers(2, 8),
    st.lists(st.integers(0, 255), min_size=0, max_size=3000),
)
def test_lzw_roundtrip_any_width(min_code, raw):
    from serene_spark.multimodal.gif import _lzw_decode, _lzw_encode

    idx = [v % (1 << min_code) for v in raw]
    assert _lzw_decode(_lzw_encode(idx, min_code), min_code) == idx


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 7),
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 2**32 - 1),
)
def test_lossless_jpeg_exact(predictor, h, w, seed):
    from serene_spark.multimodal.jpeg import decode_jpeg, make_jpeg_lossless

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(make_jpeg_lossless(img, predictor=predictor)), img
    )


@settings(max_examples=25, deadline=None)
@given(
    st.sampled_from(["rgb", "rgb_adam7", "palette", "png16", "gray_alpha"]),
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 2**32 - 1),
)
def test_png_color_type_matrix_roundtrip(shape, h, w, seed):
    from serene_spark.multimodal.binary_ops import (
        decode_png,
        make_png,
        make_png16,
        make_png_gray_alpha,
        make_png_palette,
        posterize,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    if shape == "rgb":
        assert np.array_equal(decode_png(make_png(img)), img)
    elif shape == "rgb_adam7":
        assert np.array_equal(decode_png(make_png(img, interlace=True)), img)
    elif shape == "palette":
        q = posterize(img)
        assert np.array_equal(decode_png(make_png_palette(q)), q)
    elif shape == "png16":
        assert np.array_equal(decode_png(make_png16(img)), img)
    else:
        g = img[:, :, 0]
        assert np.array_equal(
            decode_png(make_png_gray_alpha(g)), np.stack([g] * 3, axis=-1)
        )


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 4),
    st.lists(st.integers(0, 3), min_size=1, max_size=4),
    st.integers(0, 2**32 - 1),
)
def test_gif_animation_metadata_roundtrip(n_frames, disposals, seed):
    from serene_spark.multimodal.gif import (
        decode_gif_animation,
        make_gif_animated,
    )

    rng = np.random.default_rng(seed)
    disposals = (disposals * n_frames)[:n_frames]
    delays = [int(rng.integers(0, 500)) for _ in range(n_frames)]
    frames = [
        (rng.integers(0, 4, (10, 12, 3)) * 80).astype(np.uint8)
        for _ in range(n_frames)
    ]
    blob = make_gif_animated(frames, delays_cs=delays, disposals=disposals)
    got_frames, got_delays, got_disposals = decode_gif_animation(blob)
    assert len(got_frames) == n_frames
    assert got_delays == delays
    assert got_disposals == disposals
    # frame 0 is always presented verbatim (full-canvas first frame)
    assert np.array_equal(got_frames[0], frames[0])


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from([b"P6", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b""]),
    st.binary(min_size=0, max_size=400),
)
def test_decode_image_never_raises_on_garbage(magic, junk):
    """The Arrow-task-safety contract of decode_image: ANY byte string —
    including ones that start with a real format magic — returns an
    ndarray or None, never an exception (an exception inside the
    mapInPandas batch would fail the whole task)."""
    from serene_spark.multimodal.binary_ops import decode_image

    out = decode_image(magic + junk)
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from([b"", b"P6", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
                     b"GIF89a", b"RIFF", b"\x00\x00\x00\x18ftypisom"]),
    st.binary(min_size=0, max_size=400),
    st.sampled_from(["image", "audio", "video"]),
)
def test_media_decode_always_returns_a_row(magic, junk, kind):
    """_decode (the media_features kernel) must produce a well-formed
    feature tuple for ANY blob of any declared kind — INCLUDING bodies
    that start with a real container magic (this sweep caught the one
    branch without the guard: a RIFF prefix on a non-WAV body raised
    wave.Error out of the kernel) — garbage falls to the deterministic
    stub, never an exception."""
    from serene_spark.multimodal.binary_ops import _decode

    row = _decode(kind, magic + junk)
    assert len(row) == 9 and isinstance(row[-1], str)


def test_mutation_fuzz_never_oom_or_hang():
    """Seeded mutation fuzz over every real decoder: random byte flips /
    deletions / insertions into VALID containers (far likelier to reach
    deep decode paths than pure-garbage fuzz) must never raise
    MemoryError or RecursionError and must fail fast — the
    one-bad-blob-cannot-OOM-an-executor bar, pinned end to end. (A 21k-
    mutant sweep of the same generator ran clean offline; this is the
     150-per-family regression slice.) Exception TYPES other than the
    banned two are fine: the Arrow-task callers tier every exception to
    the stub, and only the documented corrupt classes promise
    ValueError."""
    import random
    import time

    from serene_spark.multimodal.binary_ops import (
        decode_png,
        decode_ppm,
        decode_wav,
        make_png,
        make_png_palette,
        make_ppm,
        make_wav,
        posterize,
    )
    from serene_spark.multimodal.gif import (
        decode_gif_animation,
        make_gif_animated,
    )
    from serene_spark.multimodal.jpeg import decode_jpeg, make_jpeg
    from serene_spark.multimodal.mp4 import make_mp4, parse_mp4

    rng = random.Random(77)
    img = decode_ppm(make_ppm(3, width=24, height=16))
    samples = [
        (make_png(img), decode_png),
        (make_png_palette(posterize(img)), decode_png),
        (make_gif_animated([posterize(img), posterize(img)[:8, :12]],
                           rects=[(0, 0), (4, 2)], disposals=[1, 2]),
         decode_gif_animation),
        (make_jpeg(img, quality=85), decode_jpeg),
        (make_ppm(3, width=24, height=16), decode_ppm),
        (make_wav(5), decode_wav),
        (make_mp4(2), parse_mp4),
    ]
    for blob, dec in samples:
        for _ in range(150):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 8)):
                if len(b) < 16:
                    break
                op = rng.random()
                if op < 0.5:
                    b[rng.randrange(len(b))] = rng.randrange(256)
                elif op < 0.75:
                    s = rng.randrange(len(b) - 1)
                    del b[s:s + rng.randint(1, 32)]
                else:
                    pos = rng.randrange(len(b))
                    b[pos:pos] = bytes(
                        rng.randrange(256) for _ in range(rng.randint(1, 16)))
            t0 = time.process_time()  # CPU time: load-insensitive, so a
            # noisy shared box can't flake the stall guard
            try:
                dec(bytes(b))
            except (MemoryError, RecursionError):
                raise
            except Exception:
                pass
            assert time.process_time() - t0 < 5.0, "decoder stalled on a mutant"
