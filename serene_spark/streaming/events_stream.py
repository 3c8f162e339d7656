"""Structured Streaming forms of the event operators.

The reference has no streaming surface (SURVEY §2.12); these are the scale
extensions' streaming path: the same tumbling-window aggregation that is
oracle-checked in batch (serene_spark/operators/events.py) expressed as
readStream -> withWatermark -> window agg, plus a file-source factory so any
parquet drop-directory becomes an event stream.

Late data: the watermark bounds state; in append mode a window closes once
the watermark passes its end. The batch/streaming results are asserted equal
in tests via an availableNow run into a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.session import tune_session

# schema for a drop-directory that is still empty when the stream starts
# (files arriving later must match it — the standard file-source contract)
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    File-source streams require an explicit schema, so probe it with a batch
    read of the same directory, then normalize ``ts`` exactly like the batch
    path in serene_spark.catalog.load_table (int64 nanos or TIMESTAMP_NTZ
    corpora both become session-tz TIMESTAMP; session tz is pinned UTC).
    An empty (not-yet-populated) drop directory cannot be probed — the
    stream starts with ``EVENTS_DDL`` and picks files up as they land.
    """
    tune_session(spark)
    from pyspark.errors import AnalysisException

    try:
        probed = spark.read.parquet(events_dir).schema
    except AnalysisException:  # no files yet
        probed = EVENTS_DDL
    raw = spark.readStream.schema(probed).parquet(events_dir)
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `events_tumbling_hour` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the batch ``events_sliding_15m`` query: overlapping
    windows via the built-in slide parameter (the batch form's offset explode
    is exactly what ``F.window`` does internally). Window starts are emitted
    as epoch seconds to match the batch output shape.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )


SESSION_GAP_MIN = 30  # same 30-minute inactivity gap as the batch twin


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the arbitrary-stateful-processing path the
    built-in window/session_window aggs can't express when per-group logic is
    imperative).

    State per user = the open session (start_us, last_us, n). Each batch the
    user's events are folded in event-time order: a gap > ``gap_minutes``
    closes the open session (emitted downstream, append mode) and starts a
    new one. Idle users are closed by an EVENT-TIME TIMEOUT at
    last_event + gap once the watermark passes it — so state is bounded by
    the watermark exactly like the built-in session windows, and a crashed
    query resumes from the checkpoint with no lost sessions.

    Scale shape: state is keyed by user_id (the natural shuffle key), one
    tiny tuple per live user; events stream through Arrow batches with no
    per-row Python overhead.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = "user_id long, session_start_us long, session_end_us long, n_events long"
    state_schema = "start_us long, last_us long, n long"

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start_us, last_us, n)], columns=cols)
            return

        ts: list[int] = []
        for pdf in pdf_iter:
            ts.extend(int(t) for t in pdf["ts_us"])
        ts.sort()
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        if last_us is not None:
            state.update((start_us, last_us, n))
            # close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark("ts", watermark)
        .withColumn("ts_us", F.unix_micros("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in session windows: per-user sessions closed by a ``gap`` of
    inactivity, via ``F.session_window`` — the declarative sibling of the
    imperative ``sessionize_stateful`` operator (same gap rule, engine-managed
    state instead of applyInPandasWithState). Emits the same
    (user, start_us, end-of-last-event_us, count) shape so tests can compare
    the two directly; note session_window's ``end`` extends ``gap`` past the
    last event, so the twin reports max(ts) instead.

    Boundary rule: ``F.session_window`` merges only on *strict* overlap, so an
    inter-event gap of exactly ``gap`` would start a new session, while the
    batch sessionizer and the stateful twin break only when the gap is
    strictly *greater* (events.py:80, :122). The window gap is therefore
    widened by 1 microsecond (sub-microsecond timestamps don't exist in
    Spark), making all three twins share one closed-boundary rule — an
    exact-``gap`` pair stays in-session everywhere.
    """
    # string form: session_window requires CalendarIntervalType and parses
    # fractional seconds, while interval arithmetic yields DayTimeIntervalType
    gap_plus = f"{gap} 0.000001 seconds"
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap_plus).alias("w"), "user_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup for at-least-once sources: drop replayed
    ``event_id``s with ``dropDuplicatesWithinWatermark`` — the streaming twin
    of the batch ``dedup_exact`` family.

    Unlike plain ``dropDuplicates`` (whose key state grows forever), state
    here is evicted once the watermark passes an event's timestamp, so memory
    is bounded by (event rate x watermark) — the only streaming-dedup shape
    that survives an unbounded stream. Keyed by event_id: the shuffle key is
    unique, skew-free.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enriched_nation_counts(
    events: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed aggregation: events joined to
    the (static, broadcast-sized) customer->nation dimension, counted per
    (window, nation).

    Scale shape: a stream-static equi-join never shuffles the stream side —
    Catalyst broadcasts the dimension into each micro-batch (the static side
    is re-read per batch, picking up dimension updates); the windowed count
    then shuffles on (window, n_name) with watermark-bounded state.
    """
    dim = customer.join(
        nation, customer["c_nationkey"] == nation["n_nationkey"]
    ).select(F.col("c_custkey").alias("user_id"), "n_name")
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", window).alias("w"), "n_name")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "n_name",
            "n_events",
        )
    )


def attribution_pairs(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream self-join: every (purchase, click) pair where the click
    is by the same user within the hour before the purchase — the pair
    relation beneath the batch ``events_attribution`` query (events.py),
    whose last-touch pick is a downstream aggregation.

    Both sides carry a watermark and the join condition bounds click time
    relative to purchase time, so Spark derives a state-eviction horizon for
    each side: a buffered click can be dropped once the watermark guarantees
    no future purchase can reach back to it. Without the time-range
    condition, stream-stream join state would grow forever — this is THE
    contract that makes the join runnable on an unbounded stream.

    Works identically on a batch DataFrame (withWatermark is a no-op there),
    so tests compare the streamed result to the same function over the batch
    read.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = click_user AND click_ts <= purchase_ts "
            "AND click_ts >= purchase_ts - interval 1 hour"
        ),
    ).select(
        "purchase_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "complete"
):
    """Drain all currently-available input into a memory sink; returns the
    started query (caller awaits termination and reads table ``query_name``).
    Stateful append operators (``sessionize_stateful``) pass
    ``output_mode="append"``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def trending_rank_sql(counts_table: str, top_k: int = 3) -> str:
    """Read-side rank for the streaming trending-top-k twin: the stream
    maintains the hourly (window, type) counts incrementally
    (``tumbling_counts``); ranks are NOT incrementally maintainable (one
    late event can reorder a whole window), so the twin re-ranks the TINY
    aggregate relation at read time — same split of work as the matview
    read-side merge. The SQL is the batch ``events_trending_hourly`` tail
    verbatim, so twin equality is equality of the maintained counts."""
    return f"""
SELECT window_start, event_type, n_events, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT window_start, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rk
  FROM {counts_table}
) r
WHERE rk <= {top_k}
"""
