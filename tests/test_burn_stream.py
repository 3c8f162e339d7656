"""Streaming SLO burn monitor (streaming/burn_stream.py): the streamed
readout must equal the batch slo_burn_rate over the same drained data,
including across a split feed, and replays must be idempotent."""

from __future__ import annotations

import pandas as pd

from serene_spark.catalog import load_table
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _normalize(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _drain(spark, parts, tmp_path):
    from serene_spark.streaming.burn_stream import start_burn_stream

    events_dir = tmp_path / "events_in"
    events_dir.mkdir(exist_ok=True)
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    for i, part in enumerate(parts):
        part.to_parquet(str(events_dir / f"chunk{i}.parquet"))
        q = start_burn_stream(spark, str(events_dir), partials_dir, ckpt)
        assert q.awaitTermination(300)
    return partials_dir, ckpt


def test_streamed_burn_equals_batch(spark, tmp_path):
    from serene_spark.streaming.burn_stream import read_burn, start_burn_stream

    ev = load_table(spark, SF, "events").toPandas()
    mid = ev.ts.quantile(0.5)
    parts = [ev[ev.ts < mid], ev[ev.ts >= mid]]
    partials_dir, ckpt = _drain(spark, parts, tmp_path)

    got = _normalize(read_burn(spark, partials_dir))
    want = _normalize(load_all()["slo_burn_rate"].spark(spark, SF))
    assert got.shape == want.shape
    assert (got.values == want.values).all()

    # idempotent replay: re-draining the same feed changes nothing
    q = start_burn_stream(spark, str(tmp_path / "events_in"), partials_dir, ckpt)
    assert q.awaitTermination(300)
    again = _normalize(read_burn(spark, partials_dir))
    assert (again.values == got.values).all()


def test_burn_compaction_invariant(spark, tmp_path):
    """compact_partials folds the hour-keyed log to ONE epoch; read_burn
    is invariant (algebraic counts), re-run a no-op, and a drain landing
    after compaction still matches the batch operator."""
    from serene_spark.streaming.burn_stream import (
        compact_partials,
        read_burn,
        start_burn_stream,
    )

    ev = load_table(spark, SF, "events").toPandas()
    t1, t2 = ev.ts.quantile(0.33), ev.ts.quantile(0.66)
    partials_dir, ckpt = _drain(
        spark, [ev[ev.ts < t1], ev[(ev.ts >= t1) & (ev.ts < t2)]], tmp_path
    )
    before = _normalize(read_burn(spark, partials_dir))
    n_epochs = spark.read.parquet(partials_dir).select("epoch").distinct().count()
    assert n_epochs >= 2

    assert compact_partials(spark, partials_dir) == n_epochs
    post = spark.read.parquet(partials_dir)
    assert post.select("epoch").distinct().count() == 1
    assert (_normalize(read_burn(spark, partials_dir)).values == before.values).all()
    assert compact_partials(spark, partials_dir) == 0

    ev[ev.ts >= t2].to_parquet(str(tmp_path / "events_in" / "chunk2.parquet"))
    q = start_burn_stream(spark, str(tmp_path / "events_in"), partials_dir, ckpt)
    assert q.awaitTermination(300)
    got = _normalize(read_burn(spark, partials_dir))
    want = _normalize(load_all()["slo_burn_rate"].spark(spark, SF))
    assert (got.values == want.values).all()
