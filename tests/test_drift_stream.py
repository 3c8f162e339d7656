"""Streaming PSI drift monitor (streaming/drift_stream.py): the streamed
readout must equal the frozen-edge batch twin after draining the same
data, replays must be idempotent, and an injected shift must flag."""

from __future__ import annotations

import shutil

from serene_spark.catalog import load_table
from serene_spark.operators.matview import SPLIT_TS

SF = "/root/testdata/sf0.001"


def _normalize(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _drain(spark, events_pdf_parts, tmp_path):
    from serene_spark.streaming.drift_stream import (
        build_reference,
        start_drift_stream,
    )

    events_dir = tmp_path / "events_in"
    events_dir.mkdir(exist_ok=True)
    ref_dir = str(tmp_path / "ref")
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    full = spark.createDataFrame(
        __import__("pandas").concat(events_pdf_parts, ignore_index=True)
    )
    build_reference(spark, full, ref_dir)
    for i, part in enumerate(events_pdf_parts):
        part.to_parquet(str(events_dir / f"chunk{i}.parquet"))
        q = start_drift_stream(spark, str(events_dir), ref_dir, partials_dir, ckpt)
        assert q.awaitTermination(300)
    return ref_dir, partials_dir, ckpt, full


def test_streamed_psi_equals_frozen_edge_batch(spark, tmp_path):
    from serene_spark.streaming.drift_stream import (
        frozen_edge_psi_batch,
        read_drift,
    )

    ev = load_table(spark, SF, "events").toPandas()
    parts = [
        ev[ev.ts < __import__("pandas").Timestamp(SPLIT_TS)],
        ev[ev.ts >= __import__("pandas").Timestamp(SPLIT_TS)],
    ]
    ref_dir, partials_dir, ckpt, full = _drain(spark, parts, tmp_path)

    got = _normalize(read_drift(spark, ref_dir, partials_dir))
    want = _normalize(frozen_edge_psi_batch(spark, full))
    assert got.shape == want.shape and (got.values == want.values).all()
    # undisturbed corpus: PSI stays in the small-sample noise band (the tiny
    # sf0.001 slices legitimately graze the 0.2 threshold; no type explodes)
    assert (got.psi < 1.0).all()
    assert (got.n_ref > 0).all() and (got.n_cur > 0).all()

    # total-loss rebuild (checkpoint AND partial log gone): re-draining the
    # same feed reconstructs the identical readout — the monitor is a pure
    # deterministic function of the feed, with no hidden mutable state.
    # (Checkpoint-only loss collapses epoch boundaries — the known
    # at-least-once caveat shared with matview_stream, where recovery is
    # rebuild-from-feed exactly as exercised here.)
    shutil.rmtree(ckpt)
    shutil.rmtree(partials_dir)
    from serene_spark.streaming.drift_stream import start_drift_stream

    q = start_drift_stream(
        spark, str(tmp_path / "events_in"), ref_dir, partials_dir, ckpt
    )
    assert q.awaitTermination(300)
    again = _normalize(read_drift(spark, ref_dir, partials_dir))
    assert (again.values == got.values).all()


def test_injected_shift_flags(spark, tmp_path):
    import pandas as pd

    from serene_spark.streaming.drift_stream import (
        frozen_edge_psi_batch,
        read_drift,
    )

    ev = load_table(spark, SF, "events").toPandas()
    target = sorted(ev.event_type.unique())[0]
    cur = ev.ts >= pd.Timestamp(SPLIT_TS)
    shifted = ev.copy()
    # push the target type's current-window values far beyond the frozen
    # training range: the clamped edge bin must absorb the mass and flag
    shifted.loc[cur & (shifted.event_type == target), "value"] = (
        shifted.loc[cur & (shifted.event_type == target), "value"] * 10 + 1000
    )
    parts = [shifted[~cur], shifted[cur]]
    ref_dir, partials_dir, _, full = _drain(spark, parts, tmp_path)

    got = _normalize(read_drift(spark, ref_dir, partials_dir))
    want = _normalize(frozen_edge_psi_batch(spark, full))
    assert (got.values == want.values).all()
    by_flag = dict(zip(got.event_type, got.drifted))
    by_psi = dict(zip(got.event_type, got.psi))
    assert by_flag[target] == 1
    # the clamped edge bin absorbs the out-of-range mass: PSI explodes far
    # beyond the small-sample noise band the other types sit in
    assert by_psi[target] > 1.0
    assert by_psi[target] > 3 * max(v for k, v in by_psi.items() if k != target)


def test_drift_compaction_invariant(spark, tmp_path):
    """compact_partials folds the (type, bin) count log to ONE epoch;
    read_drift's PSI is invariant (algebraic counts), re-run a no-op."""
    import pandas as pd

    from serene_spark.streaming.drift_stream import compact_partials, read_drift

    from serene_spark.operators.matview import SPLIT_TS

    ev = load_table(spark, SF, "events").toPandas()
    # the sink only bins the CURRENT window (ts >= SPLIT_TS): split THAT
    # across two drops so the log gets two non-empty epochs
    cur = ev[ev.ts >= __import__("pandas").Timestamp(SPLIT_TS)]
    mid = cur.ts.quantile(0.5)
    ref_dir, partials_dir, _ckpt, _full = _drain(
        spark, [ev[ev.ts < mid], ev[ev.ts >= mid]], tmp_path
    )
    before = _normalize(read_drift(spark, ref_dir, partials_dir))
    n_epochs = spark.read.parquet(partials_dir).select("epoch").distinct().count()
    assert n_epochs >= 2

    assert compact_partials(spark, partials_dir) == n_epochs
    post = spark.read.parquet(partials_dir)
    assert post.select("epoch").distinct().count() == 1
    pd.testing.assert_frame_equal(
        _normalize(read_drift(spark, ref_dir, partials_dir)), before
    )
    assert compact_partials(spark, partials_dir) == 0
