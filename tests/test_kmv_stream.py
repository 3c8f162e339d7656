"""Streaming KMV sketch maintenance (streaming/kmv_stream.py): the
streamed readout must be BIT-IDENTICAL to the batch sketch of the same
data (the merge lemma), replays must be idempotent, and the per-epoch
partial state must respect the K-per-type bound — the point of a sketch."""

from __future__ import annotations

import shutil

import pandas as pd

from serene_spark.catalog import load_table
from serene_spark.operators.sketches import KMV_K
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _drain(spark, parts, tmp_path, tag=""):
    from serene_spark.streaming.kmv_stream import start_kmv_stream

    events_dir = tmp_path / f"events_in{tag}"
    events_dir.mkdir(exist_ok=True)
    partials_dir = str(tmp_path / f"partials{tag}")
    ckpt = str(tmp_path / f"ckpt{tag}")
    for i, part in enumerate(parts):
        part.to_parquet(str(events_dir / f"chunk{i}.parquet"))
        q = start_kmv_stream(spark, str(events_dir), partials_dir, ckpt)
        assert q.awaitTermination(300)
    return partials_dir, ckpt


def _batch_sketch(spark):
    got = load_all()["kmv_ndv_users"].spark(spark, SF).toPandas()
    return (
        got[["event_type", "sketch_size", "ndv_est"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def test_streamed_sketch_equals_batch_and_replays_idempotent(spark, tmp_path):
    from serene_spark.streaming.kmv_stream import read_kmv

    ev = load_table(spark, SF, "events").toPandas()
    # three arrival chunks with overlapping users (re-occurrence dedup path)
    parts = [ev.iloc[:700], ev.iloc[700:1200], ev.iloc[1200:]]
    partials_dir, ckpt = _drain(spark, parts, tmp_path)

    streamed = read_kmv(spark, partials_dir).toPandas().reset_index(drop=True)
    batch = _batch_sketch(spark)
    pd.testing.assert_frame_equal(streamed, batch, check_dtype=False)

    # per-epoch partial state is bounded by K per type
    raw = spark.read.parquet(partials_dir).toPandas()
    per_epoch = raw.groupby(["epoch", "event_type"]).size()
    assert (per_epoch <= KMV_K).all()

    # replay from scratch (checkpoint loss): identical readout
    shutil.rmtree(ckpt)
    replay_dir = str(tmp_path / "partials_replay")
    from serene_spark.streaming.kmv_stream import start_kmv_stream

    events_dir = tmp_path / "events_in"
    q = start_kmv_stream(spark, str(events_dir), replay_dir, ckpt + "2")
    assert q.awaitTermination(300)
    replayed = read_kmv(spark, replay_dir).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(replayed, batch, check_dtype=False)


def test_merge_lemma_partition_invariance(spark, tmp_path):
    """The SAME data split differently must merge to the SAME sketch —
    mergeability, the property that makes the sketch a partial aggregate."""
    from serene_spark.streaming.kmv_stream import read_kmv

    ev = load_table(spark, SF, "events").toPandas()
    a = _drain(spark, [ev.iloc[::2], ev.iloc[1::2]], tmp_path, tag="_a")[0]
    b = _drain(spark, [ev], tmp_path, tag="_b")[0]
    pd.testing.assert_frame_equal(
        read_kmv(spark, a).toPandas().reset_index(drop=True),
        read_kmv(spark, b).toPandas().reset_index(drop=True),
    )


def test_compaction_bit_identical_bounded_and_composes(spark, tmp_path):
    """compact_partials must (a) collapse the log to ONE epoch of <= K
    rows per type, (b) leave the readout BIT-identical, (c) be idempotent
    under re-run, and (d) compose with epochs that arrive AFTER
    compaction exactly as if the original partials were still there."""
    from serene_spark.streaming.kmv_stream import (
        compact_partials,
        read_kmv,
        start_kmv_stream,
    )

    ev = load_table(spark, SF, "events").toPandas()
    parts = [ev.iloc[:700], ev.iloc[700:1200]]
    partials_dir, ckpt = _drain(spark, parts, tmp_path)

    before = read_kmv(spark, partials_dir).toPandas().reset_index(drop=True)
    raw = spark.read.parquet(partials_dir).toPandas()
    n_epochs = raw["epoch"].nunique()
    assert n_epochs >= 2

    assert compact_partials(spark, partials_dir) == n_epochs
    after = spark.read.parquet(partials_dir).toPandas()
    assert after["epoch"].nunique() == 1  # state back to a single epoch
    assert (after.groupby("event_type").size() <= KMV_K).all()
    compacted = read_kmv(spark, partials_dir).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(compacted, before)

    assert compact_partials(spark, partials_dir) == 0  # idempotent no-op
    pd.testing.assert_frame_equal(
        read_kmv(spark, partials_dir).toPandas().reset_index(drop=True), before
    )

    # stream the remaining chunk INTO the compacted log: final readout
    # must equal the batch sketch of ALL events (= the never-compacted run)
    events_dir = tmp_path / "events_in"
    ev.iloc[1200:].to_parquet(str(events_dir / "chunk2.parquet"))
    q = start_kmv_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)
    final = read_kmv(spark, partials_dir).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(final, _batch_sketch(spark), check_dtype=False)
