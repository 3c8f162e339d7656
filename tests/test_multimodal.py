"""Multimodal binary-column plumbing: Arrow batch flow, deterministic stub
decode, frame sampling plan shape."""

from __future__ import annotations


def test_media_features_deterministic(spark):
    from serene_spark.multimodal.binary_ops import extract_media_features, make_fake_media

    media = make_fake_media(spark, 48)
    feats = extract_media_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 48
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in extract_media_features(media).collect()}
    for k in rows:
        assert rows[k] == rows2[k]
    # images are single-frame by stub contract
    assert all(r["n_frames"] == 1 for r in rows.values() if r["kind"] == "image")
    assert all(64 <= r["width"] < 256 for r in rows.values())


def test_frame_sampling(spark):
    from serene_spark.multimodal.binary_ops import (
        extract_media_features,
        make_fake_media,
        sample_frames,
    )

    feats = extract_media_features(make_fake_media(spark, 30))
    frames = sample_frames(feats, every_k=8).collect()
    by_media: dict[int, list[int]] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    fmap = {r["media_id"]: r["n_frames"] for r in feats.collect()}
    for mid, idxs in by_media.items():
        expect = list(range(0, fmap[mid], 8)) if fmap[mid] > 1 else [0]
        assert sorted(idxs) == expect
