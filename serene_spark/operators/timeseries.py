"""Time-series operators over the events stream: regular-grid gap filling
with last-observation-carried-forward (LOCF), and OHLC bucket downsampling.

Standard telemetry/finance warehouse shapes (TimescaleDB's ``time_bucket_
gapfill``/``locf``, Pandas ``resample().ffill()``/``ohlc()``) expressed as
dialect-shared SQL — no Python in the path, both oracle-exact.

Scale shapes (100 TB):

* ``ts_gapfill_locf`` — events reduce FIRST to the (user, hour) relation
  (one keyed agg — the only event-cardinality shuffle); a LEAD window over
  that small relation turns each observed hour into a gap-run, and runs
  explode map-side into the dense series carrying their value (LOCF by
  construction).  One scan, one event-sized shuffle, no grid join.  Series
  size is bounded by Σ per-user active spans, not |users| × |calendar|.
* ``ts_ohlc_daily`` — one keyed agg; open/close are arg_min/arg_max by a
  zero-padded (epoch, event_id) string key, so ties on the timestamp are
  broken deterministically on any engine (the corpus has unique micros
  timestamps today, but the operator must not depend on that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import (
    DUCKDB,
    SPARK,
    arg_max_by,
    arg_min_by,
    epoch_us,
    explode_seq,
    idiv,
)
from serene_spark.registry import register

HOUR_US = 3600 * 1_000_000
DAY_US = 24 * HOUR_US


def _sortkey(dialect: str) -> str:
    """Total-order tie-break key: zero-padded epoch micros then event_id.
    String compare == numeric compare because both fields are fixed-width."""
    us = epoch_us(dialect, "ts")
    # 20-char pads cover the full BIGINT range on BOTH fields: lpad
    # TRUNCATES over-width input, which would silently break the total
    # order for ids >= 10^width
    return f"lpad(CAST({us} AS STRING), 20, '0') || lpad(CAST(event_id AS STRING), 20, '0')" \
        if dialect == SPARK else \
        f"lpad(CAST({us} AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 20, '0')"


def ts_gapfill_sql(dialect: str) -> str:
    """Hourly per-user series with gaps filled and values carried forward.

    Semantics: within each user's [first active hour, last active hour]
    span, every hour gets a row; ``observed`` marks real hours; ``value_locf``
    is the last value at-or-before the hour (the value of the latest event
    in the hour for observed hours — deterministic arg_max — else carried
    forward).

    Formulation: each observed hour owns the RUN of hours up to (not
    including) the user's next observed hour (LEAD), and the run explodes
    map-side carrying its value — LOCF by construction.  One reference to
    the hourly relation, so one events scan, no grid self-join, and no
    window-over-grid: a grid + LEFT JOIN + IGNORE-NULLS-window phrasing
    reads events twice because Catalyst inlines the shared CTE into both
    the span scan and the join probe.
    """
    hour = idiv(dialect, epoch_us(dialect, "ts"), str(HOUR_US))
    v_last = arg_max_by(dialect, "value", _sortkey(dialect))
    return f"""
WITH hourly AS (
  SELECT user_id, {hour} AS hour_bucket,
         {v_last} AS v_last,
         COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2
),
runs AS (
  SELECT user_id, hour_bucket, v_last, n_events,
         COALESCE(LEAD(hour_bucket) OVER (
           PARTITION BY user_id ORDER BY hour_bucket) - 1,
           hour_bucket) AS run_end
  FROM hourly
)
SELECT user_id,
       CAST(h AS BIGINT) AS hour_bucket,
       CASE WHEN h = hour_bucket THEN 1 ELSE 0 END AS observed,
       CAST(CASE WHEN h = hour_bucket THEN n_events ELSE 0 END AS BIGINT) AS n_events,
       ROUND(v_last, 6) AS value_locf
FROM (
  SELECT user_id, hour_bucket, v_last, n_events,
         {explode_seq(dialect, "hour_bucket", "run_end")} AS h
  FROM runs
) x
"""


def ts_ohlc_sql(dialect: str) -> str:
    """Daily OHLC downsample per event_type: open/close by deterministic
    first/last event in the bucket, high/low, volume."""
    day = idiv(dialect, epoch_us(dialect, "ts"), str(DAY_US))
    key = _sortkey(dialect)
    return f"""
SELECT event_type,
       CAST({day} AS BIGINT) AS day_bucket,
       ROUND({arg_min_by(dialect, "value", key)}, 6) AS open_value,
       ROUND(MAX(value), 6) AS high_value,
       ROUND(MIN(value), 6) AS low_value,
       ROUND({arg_max_by(dialect, "value", key)}, 6) AS close_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, 2
"""


def _events_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("events",))
        return spark.sql(sql_fn(SPARK))

    return run


register(
    "ts_gapfill_locf",
    oracle=ts_gapfill_sql(DUCKDB),
    doc="hourly gap-filled per-user series with last-observation-carried-"
    "forward; grid generated per-user span (never users x calendar)",
)(_events_query(ts_gapfill_sql))

register(
    "ts_ohlc_daily",
    oracle=ts_ohlc_sql(DUCKDB),
    doc="daily OHLC downsample per event type with deterministic "
    "(epoch, event_id) open/close tie-break",
)(_events_query(ts_ohlc_sql))
