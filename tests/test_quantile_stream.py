"""Streaming quantile-sketch maintenance (streaming/quantile_stream.py):
the streamed p50/p90/p99 readout must be BIT-IDENTICAL to the batch
quantile_sketch_bottomk of the same events (merge lemma over row
hashes), replays must be idempotent, and the per-epoch partial state
must respect the K-per-type bound."""

from __future__ import annotations

import shutil

import pandas as pd

from serene_spark.catalog import load_table
from serene_spark.operators.sketches import QSK_K
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _drain(spark, parts, tmp_path, tag=""):
    from serene_spark.streaming.quantile_stream import start_quantile_stream

    events_dir = tmp_path / f"events_in{tag}"
    events_dir.mkdir(exist_ok=True)
    partials_dir = str(tmp_path / f"partials{tag}")
    ckpt = str(tmp_path / f"ckpt{tag}")
    for i, part in enumerate(parts):
        part.to_parquet(str(events_dir / f"chunk{i}.parquet"))
        q = start_quantile_stream(spark, str(events_dir), partials_dir, ckpt)
        assert q.awaitTermination(300)
    return partials_dir, ckpt


def _batch_readout(spark):
    got = load_all()["quantile_sketch_bottomk"].spark(spark, SF).toPandas()
    return (
        got[["event_type", "sample_n", "p50_est", "p90_est", "p99_est"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def test_streamed_quantiles_equal_batch_and_replays_idempotent(spark, tmp_path):
    from serene_spark.streaming.quantile_stream import read_quantiles

    ev = load_table(spark, SF, "events").toPandas()
    parts = [ev.iloc[:700], ev.iloc[700:1200], ev.iloc[1200:]]
    partials_dir, ckpt = _drain(spark, parts, tmp_path)

    streamed = read_quantiles(spark, partials_dir).toPandas().reset_index(drop=True)
    batch = _batch_readout(spark)
    pd.testing.assert_frame_equal(streamed, batch, check_dtype=False)

    # per-epoch partial state is bounded by K per type
    raw = spark.read.parquet(partials_dir).toPandas()
    per_epoch = raw.groupby(["epoch", "event_type"]).size()
    assert (per_epoch <= QSK_K).all()

    # replay from scratch (checkpoint loss): identical readout — the
    # epoch partitions are overwritten idempotently
    shutil.rmtree(ckpt)
    partials2, _ = _drain(spark, parts, tmp_path, tag="_replay")
    replayed = read_quantiles(spark, partials2).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(replayed, batch, check_dtype=False)


def test_single_batch_stream_equals_multi_batch(spark, tmp_path):
    """Arrival chunking must not matter: one big epoch and three small
    epochs merge to the same global sample (the lemma, directly)."""
    from serene_spark.streaming.quantile_stream import read_quantiles

    ev = load_table(spark, SF, "events").toPandas()
    one, _ = _drain(spark, [ev], tmp_path, tag="_one")
    three, _ = _drain(
        spark, [ev.iloc[:500], ev.iloc[500:900], ev.iloc[900:]], tmp_path, tag="_three"
    )
    a = read_quantiles(spark, one).toPandas().reset_index(drop=True)
    b = read_quantiles(spark, three).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_compaction_bit_identical_bounded_and_composes(spark, tmp_path):
    """compact_partials must (a) collapse the log to ONE epoch of <= K
    rows per type, (b) leave the streamed quantile readout BIT-identical,
    (c) be idempotent under re-run, and (d) compose with epochs arriving
    AFTER compaction exactly as if the original partials remained."""
    import pandas as pd

    from serene_spark.catalog import load_table
    from serene_spark.operators.sketches import QSK_K
    from serene_spark.streaming.quantile_stream import (
        compact_partials,
        read_quantiles,
        start_quantile_stream,
    )

    ev = load_table(spark, SF, "events").toPandas()
    parts = [ev.iloc[:700], ev.iloc[700:1200]]
    partials_dir, ckpt = _drain(spark, parts, tmp_path)

    before = read_quantiles(spark, partials_dir).toPandas().reset_index(drop=True)
    raw = spark.read.parquet(partials_dir).toPandas()
    n_epochs = raw["epoch"].nunique()
    assert n_epochs >= 2

    assert compact_partials(spark, partials_dir) == n_epochs
    after = spark.read.parquet(partials_dir).toPandas()
    assert after["epoch"].nunique() == 1
    assert (after.groupby("event_type").size() <= QSK_K).all()
    pd.testing.assert_frame_equal(
        read_quantiles(spark, partials_dir).toPandas().reset_index(drop=True),
        before,
    )

    assert compact_partials(spark, partials_dir) == 0
    pd.testing.assert_frame_equal(
        read_quantiles(spark, partials_dir).toPandas().reset_index(drop=True),
        before,
    )

    # remaining chunk lands AFTER compaction: readout == full-stream readout
    events_dir = tmp_path / "events_in"
    ev.iloc[1200:].to_parquet(str(events_dir / "chunk2.parquet"))
    q = start_quantile_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)
    final = read_quantiles(spark, partials_dir).toPandas().reset_index(drop=True)
    full = _drain(spark, [ev], tmp_path, tag="_full")[0]
    pd.testing.assert_frame_equal(
        final, read_quantiles(spark, full).toPandas().reset_index(drop=True)
    )
