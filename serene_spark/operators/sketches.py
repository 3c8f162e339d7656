"""Sketch operators — the approximate substrate for distinct counts and
quantiles at 100 TB.

Exact COUNT(DISTINCT) and exact percentiles are the repo's oracle-checked
baselines (events_tumbling_hour's n_users, events_value_quantiles); these
sketch twins are the production path at scale:

* HyperLogLog distinct counting: fixed-size register arrays replace the
  distinct-pair shuffle — memory per group is O(2^p), not O(n_distinct),
  and partial aggregation merges losslessly on the map side.
* Sketch ROLLUP (the Apache DataSketches pattern, exposed in Spark as
  hll_sketch_agg / hll_union_agg / hll_sketch_estimate): persist fine-grained
  (day, key) sketches once, answer any coarser rollup later by register-wise
  union WITHOUT rescanning the raw data. Union of same-precision HLL
  sketches is exact over the sketch state, so the rolled-up estimate is
  bit-identical to a direct sketch of the union — pinned by test.
* approx_percentile (KLL-family quantile sketch): bounded-memory mergeable
  quantiles; rank error <= 1/accuracy, vs the full sort an exact percentile
  needs.

No DuckDB oracles: sketch register states are engine-specific, so the driver
checks these rows-only; the error bounds and the merge-losslessness invariant
are pinned by pytest against the exact baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.registry import register

QUANTILE_ACCURACY = 10000  # rank error <= 1/accuracy = 0.01%

APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(approx_count_distinct(user_id) AS BIGINT) AS approx_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""

# fine-grained daily sketches unioned up to event_type — the persisted-sketch
# rollup pattern: the daily relation would be WRITTEN once per day at 100 TB
# and every later query unions registers instead of rescanning raw events
HLL_ROLLUP_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         hll_sketch_agg(user_id) AS sk
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
)
SELECT event_type,
       CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT) AS approx_users,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM daily
GROUP BY event_type
"""

APPROX_QUANTILES_SQL = f"""
SELECT event_type,
       round(approx_percentile(value, 0.25, {QUANTILE_ACCURACY}), 6) AS p25,
       round(approx_percentile(value, 0.50, {QUANTILE_ACCURACY}), 6) AS p50,
       round(approx_percentile(value, 0.75, {QUANTILE_ACCURACY}), 6) AS p75,
       round(approx_percentile(value, 0.95, {QUANTILE_ACCURACY}), 6) AS p95,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


def _events_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("events",))
        return spark.sql(sql)

    return run


register("approx_distinct_users",
         doc="HyperLogLog distinct users per event type (sketch twin of the "
         "exact n_users baseline; rows-only, error bound pinned by pytest)")(
    _events_query(APPROX_DISTINCT_SQL))
register("hll_rollup_users",
         doc="persisted-sketch rollup: daily HLL sketches unioned to event "
         "type without rescanning raw data (rows-only)")(
    _events_query(HLL_ROLLUP_SQL))
register("approx_quantiles_value",
         doc="mergeable quantile sketch per event type (twin of the exact "
         "events_value_quantiles; rows-only)")(
    _events_query(APPROX_QUANTILES_SQL))
