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


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Closed sessions emitted by the applyInPandasWithState operator must be
    exactly real batch sessions; every session that is provably closed within
    the batch (a later event exists for the user) must be emitted."""
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        sessionize_stateful,
    )

    events_dir = tmp_path / "events_in2"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    stream = sessionize_stateful(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_sessions", str(tmp_path / "ckpt2"), "append")
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from stream_sessions").collect()
    }

    # batch truth: fold each user's sorted event times with the same gap rule
    from serene_spark.catalog import load_table
    from serene_spark.operators.events import SESSION_GAP_US

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t")
        .orderBy("user_id", "t")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["t"])
    all_sessions, closed_in_batch = set(), set()
    for u, ts in by_user.items():
        sessions = []
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > SESSION_GAP_US:
                sessions.append((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        sessions.append((u, start, last, n))
        all_sessions.update(sessions)
        closed_in_batch.update(sessions[:-1])  # the final session may stay open

    assert closed_in_batch, "fixture should contain multi-session users"
    assert closed_in_batch <= got <= all_sessions


def test_dedup_within_watermark_drops_replays(spark, sf_dir, tmp_path):
    """An at-least-once source that replays a file must yield each event_id
    once: two copies of the same parquet in, batch-distinct out."""
    from serene_spark.streaming.events_stream import (
        dedup_within_watermark,
        read_events_stream,
        run_available_now,
    )

    events_dir = tmp_path / "events_in3"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-1.parquet")  # replay

    stream = dedup_within_watermark(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_dedup", str(tmp_path / "ckpt3"), "append")
    q.awaitTermination(120)

    got = sorted(
        r["event_id"] for r in spark.sql("select event_id from stream_dedup").collect()
    )

    from serene_spark.catalog import load_table

    want = sorted(
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    )
    assert got == want


def test_enriched_nation_counts_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join + windowed count equals the batch join."""
    from serene_spark.streaming.events_stream import (
        enriched_nation_counts,
        read_events_stream,
        run_available_now,
    )
    from serene_spark.catalog import load_table

    events_dir = tmp_path / "events_in4"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    stream = enriched_nation_counts(
        read_events_stream(spark, str(events_dir)), customer, nation
    )
    q = run_available_now(stream, "stream_enriched", str(tmp_path / "ckpt4"))
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_name"]): r["n_events"]
        for r in spark.sql("select * from stream_enriched").collect()
    }

    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    dim = customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"]).select(
        F.col("c_custkey").alias("user_id"), "n_name"
    )
    want = {
        (r["window_start"], r["n_name"]): r["n_events"]
        for r in events.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "n_name")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("window_start"), "n_name", "n_events"
        )
        .collect()
    }
    assert got and got == want


def test_sliding_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streaming sliding-window twin must equal the batch offset-explode
    form (same epoch-second window starts)."""
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        sliding_counts,
    )

    events_dir = tmp_path / "events_in5"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    stream = sliding_counts(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_sliding", str(tmp_path / "ckpt5"))
    q.awaitTermination(120)
    got = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from stream_sliding").collect()
    }

    from serene_spark.catalog import register_views
    from serene_spark.operators.events import sliding_counts_sql

    register_views(spark, sf_dir, ("events",))
    want = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in spark.sql(sliding_counts_sql("spark")).collect()
    }
    assert got and got == want


def test_session_window_equals_stateful_sessions(spark, sf_dir, tmp_path):
    """The built-in session_window aggregation must produce exactly the batch
    session set the imperative sessionizer is validated against."""
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        session_window_counts,
    )

    events_dir = tmp_path / "events_in6"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    stream = session_window_counts(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_swin", str(tmp_path / "ckpt6"))
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from stream_swin").collect()
    }

    # batch truth: same fold as test_stateful_sessionize_matches_batch
    from serene_spark.catalog import load_table
    from serene_spark.operators.events import SESSION_GAP_US

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t")
        .orderBy("user_id", "t")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["t"])
    want = set()
    for u, ts in by_user.items():
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > SESSION_GAP_US:
                want.add((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        want.add((u, start, last, n))
    assert got == want


def test_stream_stream_attribution_matches_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream self-join must produce exactly the pair
    set of the same function applied to the batch read, and its last-touch
    reduction must equal the registered events_attribution query."""
    from serene_spark.catalog import load_table, register_views
    from serene_spark.operators.events import attribution_sql
    from serene_spark.streaming.events_stream import (
        attribution_pairs,
        read_events_stream,
        run_available_now,
    )

    events_dir = tmp_path / "events_attr"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    stream = attribution_pairs(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_attr", str(tmp_path / "ckpt_attr"), "append")
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["user_id"], r["purchase_us"], r["click_id"], r["gap_us"])
        for r in spark.sql("select * from stream_attr").collect()
    }

    batch_pairs = attribution_pairs(load_table(spark, sf_dir, "events"))
    want = {
        (r["purchase_id"], r["user_id"], r["purchase_us"], r["click_id"], r["gap_us"])
        for r in batch_pairs.collect()
    }
    assert got == want and got  # identical pair sets, non-empty

    # last-touch reduction of the streamed pairs == registered batch query
    last_touch = {}
    for pid, user, pus, cid, gap in got:
        cur = last_touch.get(pid)
        # most recent click first (smallest gap), then highest click_id
        if cur is None or (gap, -cid) < (cur[2], -cur[1]):
            last_touch[pid] = (user, cid, gap)
    from serene_spark.functions.sqlgen import SPARK

    register_views(spark, sf_dir, ("events",))
    reg = {
        r["purchase_id"]: (r["user_id"], r["click_id"], r["gap_us"])
        for r in spark.sql(attribution_sql(SPARK)).collect()
    }
    assert last_touch == reg


def test_trending_twin_equals_batch(spark, sf_dir, tmp_path):
    """Streamed hourly counts + read-side rank == batch events_trending_hourly."""
    import shutil

    from serene_spark.registry import load_all
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        trending_rank_sql,
        tumbling_counts,
    )

    events_dir = tmp_path / "events_trend"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")
    stream = tumbling_counts(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "stream_trending_counts", str(tmp_path / "ckpt_trend"))
    q.awaitTermination(120)
    got = sorted(
        tuple(r)
        for r in spark.sql(trending_rank_sql("stream_trending_counts")).select(
            "window_start", "event_type", "n_events", "rk"
        ).collect()
    )
    batch = sorted(
        tuple(r)
        for r in load_all()["events_trending_hourly"].spark(spark, sf_dir).select(
            "window_start", "event_type", "n_events", "rk"
        ).collect()
    )
    assert got == batch and len(got) > 0


def test_trending_twin_across_two_drains(spark, sf_dir, tmp_path):
    """The read-side-rank claim under incremental arrival: drain half the
    events, then the rest (same overlapping hours arriving 'late' but
    within the watermark), and the re-ranked view must equal the batch
    trending query over the full corpus — counts maintained incrementally,
    ranks recomputed read-side each time."""
    from serene_spark.catalog import load_table, register_views
    from serene_spark.registry import load_all
    from serene_spark.streaming.events_stream import (
        read_events_stream,
        run_available_now,
        trending_rank_sql,
        tumbling_counts,
    )

    events_dir = tmp_path / "events_2d"
    events_dir.mkdir()
    ev = load_table(spark, sf_dir, "events")
    # split by event id parity: both halves span the SAME hours, so the
    # second drain updates existing windows rather than appending new ones
    def _land(predicate: str, stage: str) -> None:
        """Write a batch to a staging dir, then land its part files flat in
        the watched dir (the stream source does not recurse)."""
        import glob

        stage_dir = tmp_path / stage
        ev.filter(predicate).coalesce(1).write.parquet(str(stage_dir))
        for i, f in enumerate(glob.glob(str(stage_dir / "part-*.parquet"))):
            shutil.copy(f, events_dir / f"{stage}-{i}.parquet")

    _land("event_id % 2 = 0", "batch0")
    stream = tumbling_counts(read_events_stream(spark, str(events_dir)))
    ckpt = str(tmp_path / "ckpt_2d")
    q = run_available_now(stream, "trend_2d", ckpt)
    q.awaitTermination(120)
    partial = spark.sql(trending_rank_sql("trend_2d")).count()
    assert partial > 0

    _land("event_id % 2 = 1", "batch1")
    stream = tumbling_counts(read_events_stream(spark, str(events_dir)))
    q = run_available_now(stream, "trend_2d", ckpt)
    q.awaitTermination(120)

    got = sorted(
        tuple(r)
        for r in spark.sql(trending_rank_sql("trend_2d")).select(
            "window_start", "event_type", "n_events", "rk"
        ).collect()
    )
    batch = sorted(
        tuple(r)
        for r in load_all()["events_trending_hourly"].spark(spark, sf_dir).select(
            "window_start", "event_type", "n_events", "rk"
        ).collect()
    )
    assert got == batch
