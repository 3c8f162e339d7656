"""Rule-based multi-touch attribution — the position-based (U-shaped) and
time-decay credit models that sit beside the data-driven Markov
removal-effect operator (operators/attribution_markov.py).  All three share
ONE journey definition: a user's touches are their non-purchase events
strictly before their FIRST purchase (ordered by (ts, event_id), the
engine-wide deterministic event order).

* ``attribution_position_u`` — U-shaped credit: 1 touch → 100 %,
  2 touches → 50/50, otherwise first 40 %, last 40 %, middles split the
  remaining 20 % equally.  Credits are exact rationals quantized to 12 dp
  and DECIMAL-summed per channel, so partial-aggregation order cannot move
  a digit.
* ``attribution_time_decay`` — exponential decay with a 7-day half-life:
  w = 2^(−Δt/halflife) against the conversion instant, normalized per
  conversion, 12-dp-quantized, DECIMAL-summed per channel.

Scale: one events scan → user-keyed window (first-purchase cutoff + touch
ordinals) → per-channel agg.  The window partitions on user_id (bounded
per-user history), the agg keys on channel (constant cardinality) — the
same two-exchange shape as the Markov sibling; no journey is ever
materialized as an array.
"""

from __future__ import annotations

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, epoch_us
from serene_spark.registry import register

HALF_LIFE_DAYS = 7.0


def _touches_rel(dialect: str) -> str:
    """Converting users' pre-conversion touches with ordinals and k."""
    us = epoch_us(dialect, "ts")
    return f"""fp AS (
  SELECT user_id, MIN({us}) AS fp_us
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
pre AS (
  SELECT e.user_id, e.event_type AS channel, {us} AS us, e.event_id, f.fp_us
  FROM events e JOIN fp f ON e.user_id = f.user_id
  WHERE {us} < f.fp_us AND e.event_type <> 'purchase'
),
touches AS (
  SELECT user_id, channel, us, fp_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id) AS k
  FROM pre
)"""


def _position_sql(dialect: str) -> str:
    credit = """CASE
           WHEN k = 1 THEN 1.0
           WHEN k = 2 THEN 0.5
           WHEN pos = 1 OR pos = k THEN 0.4
           ELSE 0.2 / (k - 2)
         END"""
    return f"""
WITH {_touches_rel(dialect)},
credits AS (
  SELECT channel,
         CAST(ROUND({credit}, 12) AS DECIMAL(20,12)) AS credit
  FROM touches
)
SELECT channel,
       ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credit,
       CAST(COUNT(*) AS BIGINT) AS touches
FROM credits
GROUP BY channel
ORDER BY channel
"""


def _decay_sql(dialect: str) -> str:
    half_us = HALF_LIFE_DAYS * 86400.0 * 1e6
    w = f"pow(2.0, -CAST(fp_us - us AS DOUBLE) / {half_us})"
    return f"""
WITH {_touches_rel(dialect)},
weighted AS (
  SELECT user_id, channel, {w} AS w,
         SUM({w}) OVER (PARTITION BY user_id) AS w_tot
  FROM touches
),
credits AS (
  SELECT channel,
         CAST(ROUND(w / w_tot, 12) AS DECIMAL(20,12)) AS credit
  FROM weighted
)
SELECT channel,
       ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credit,
       CAST(COUNT(*) AS BIGINT) AS touches
FROM credits
GROUP BY channel
ORDER BY channel
"""


def _runner(sql: str):
    def run(spark, sf_dir):
        register_views(spark, sf_dir, ("events",))
        return spark.sql(sql)

    return run


register(
    "attribution_position_u",
    oracle=_position_sql(DUCKDB),
    doc="U-shaped (40/20/40) position-based multi-touch attribution over "
    "the engine-wide journey definition; exact-rational credits quantized "
    "to 12 dp and decimal-summed per channel",
)(_runner(_position_sql(SPARK)))

register(
    "attribution_time_decay",
    oracle=_decay_sql(DUCKDB),
    doc=f"Time-decay attribution (half-life {HALF_LIFE_DAYS} days) against "
    "the conversion instant, normalized per conversion, 12-dp-quantized "
    "decimal channel sums",
)(_runner(_decay_sql(SPARK)))
