"""Structured Streaming twin of the batch tumbling-window query: an
availableNow drain over the events parquet must equal the batch result."""

from __future__ import annotations

import shutil


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        tumbling_counts,
    )

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    stream = tumbling_counts(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_tumbling", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from stream_tumbling").collect()
    }

    from serene_spark.catalog import register_views
    from serene_spark.operators.events import TUMBLING_SQL

    register_views(spark, sf_dir, ("events",))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(TUMBLING_SQL).collect()
    }
    assert got == want
