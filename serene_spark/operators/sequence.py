"""Event-sequence analytics: per-user Markov transition matrix and
windowed rate-anomaly detection — the product-analytics operators layered
on ordered event streams.

Scale shapes (100 TB):

* ``event_transitions`` — LEAD over (user, time) gives each event its
  successor; the transition matrix is then one tiny keyed agg.  One
  user-keyed shuffle for the window (the sessionizer's layout — on a
  cluster the events table is bucketed by user_id and the window is
  exchange-free).
* ``events_hourly_anomalies`` — hourly counts first (event-cardinality agg),
  then a trailing-window z-score over the TINY hourly relation.  Variance
  comes from integer-exact window sums (Σx, Σx², n) rather than
  ``stddev_samp`` so both engines compute the identical rational number —
  Welford-vs-sum-of-squares implementation differences never surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, epoch_us, idiv
from serene_spark.registry import register

TRAIL = 24  # trailing window (hours) for the anomaly baseline
Z_THRESHOLD = 3.0


def transitions_sql(dialect: str) -> str:
    """P(next event_type | event_type) over per-user time-ordered streams,
    with counts and a row-conditional probability.  Ties on ts break by
    event_id (total order)."""
    us = epoch_us(dialect, "ts")
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY {us}, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type,
       CAST(n AS BIGINT) AS n_transitions,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS p_next
FROM pairs
"""


def anomalies_sql(dialect: str) -> str:
    """Hourly event-rate z-scores against the trailing {TRAIL}-hour
    baseline per event_type; flags |z| >= {Z_THRESHOLD}.  Baseline mean and
    variance derive from integer window sums (exact).

    The baseline is a RANGE window over hour_bucket — true wall-clock
    {TRAIL} hours, not "{TRAIL} preceding observed rows" (a ROWS frame
    silently stretches over arbitrary wall-clock time for sparse types).
    Hours with zero events produce no row, so the baseline is the mean of
    OBSERVED hours and an all-quiet hour (outage) is not flagged — this is
    a spike detector; absence detection needs the gap-filled series
    (ts_gapfill_locf) upstream."""
    hour = idiv(dialect, epoch_us(dialect, "ts"), str(3600 * 1_000_000))
    w = (
        f"OVER (PARTITION BY event_type ORDER BY hour_bucket "
        f"RANGE BETWEEN {TRAIL} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
WITH hourly AS (
  SELECT event_type, {hour} AS hour_bucket, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, hour_bucket, cnt,
         SUM(cnt) {w} AS s1,
         SUM(cnt * cnt) {w} AS s2,
         COUNT(*) {w} AS n
  FROM hourly
)
SELECT event_type,
       CAST(hour_bucket AS BIGINT) AS hour_bucket,
       CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS baseline_mean,
       ROUND((cnt - CAST(s1 AS DOUBLE) / n)
             / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                    / (n - 1)), 6) AS z_score,
       CASE WHEN abs((cnt - CAST(s1 AS DOUBLE) / n)
                     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                            / (n - 1))) >= {Z_THRESHOLD}
            THEN 1 ELSE 0 END AS is_anomaly
FROM win
WHERE n >= 12
  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) > 0
"""


def _events_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("events",))
        return spark.sql(sql_fn(SPARK))

    return run


register(
    "event_transitions",
    oracle=transitions_sql(DUCKDB),
    doc="per-user Markov transition matrix: P(next event_type | event_type) "
    "with counts, LEAD over time-ordered streams",
)(_events_query(transitions_sql))

register(
    "events_hourly_anomalies",
    oracle=anomalies_sql(DUCKDB),
    doc=f"hourly rate anomalies: z-score vs trailing {TRAIL}h baseline per "
    "event type from integer-exact window sums",
)(_events_query(anomalies_sql))
