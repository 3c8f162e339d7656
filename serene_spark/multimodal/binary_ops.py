"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernels are STUBBED with a deterministic fake (content-hash-derived
pseudo-dimensions) behind ``try: import PIL``; everything Spark-side — the
schema, Arrow batch flow through mapInPandas, partition-size control — is
real and tested. Swapping the stub for a real decoder changes ONE function.

Scale notes: media bytes never pass through a Python row loop — Arrow
batches via mapInPandas; `spark.sql.files.maxPartitionBytes` (and at write
time, target file sizing) keeps per-task memory bounded when media blobs are
large; metadata-only operations project away the binary column first so the
scan never materializes bytes (columnar parquet prunes it).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id long, kind string, media binary"
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, sha256 string, width long, height long, n_frames long"


def make_fake_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media blobs (content = sha-stretched id)."""
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        seed = hashlib.sha256(str(i).encode()).digest()
        rows.append((i, kinds[i % 3], seed * (4 + i % 7)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(kind: str, blob: bytes) -> tuple[int, int, int]:
    """STUB decode: deterministic pseudo-dimensions from the content hash.

    Replace with PIL/librosa/pyav when available; the Spark plumbing around
    it is unchanged.
    """
    try:  # pragma: no cover - decode libs absent in this container
        if kind == "image":
            import io

            from PIL import Image  # noqa: F401

            img = Image.open(io.BytesIO(blob))
            return img.width, img.height, 1
    except Exception:
        pass
    h = hashlib.sha256(blob).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    return width, height, n_frames


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media (mapInPandas)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(k, bytes(b)) for k, b in zip(pdf["kind"], pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                    "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["media"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(fe, FEATURE_SCHEMA)


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
