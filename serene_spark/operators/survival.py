"""Survival analysis: Kaplan-Meier estimation of time-to-next-order.

The question every retention team asks — "how long until a customer
orders again, and how many never do?" — is a right-censored duration
problem: consecutive order gaps are OBSERVED events, while the gap from
each customer's last order to the end of the observation window is
CENSORED (the next order simply hasn't happened yet).  Treating censored
gaps as events (or dropping them) biases the curve optimistic; the
Kaplan-Meier product-limit estimator is the standard correction
(Kaplan & Meier 1958).

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

with d_i events at duration t_i and n_i the at-risk count (durations
>= t_i, censored included).

Scale shape (100 TB): ONE window pass over orders (LEAD per customer —
the same per-key shuffle every sessionization uses) reduces the corpus
to per-duration counts ``(gap_days, n_events, n_censored)`` — a relation
bounded by the calendar span (~2.4k rows here, never data-scale).  The
at-risk counts and the product-limit curve are cumulative windows over
that SMALL relation; the product is computed as EXP of a cumulative sum
of 12-dp-rounded log terms summed in DECIMAL, so partial-aggregation
order cannot move a digit and both engines agree bit-for-bit after the
6-dp output round.  The d = n_risk boundary (everything still at risk
dies at the largest duration) is emitted as an exact 0.0 rather than
LN(0), which Spark NULLs and DuckDB -infs — a real dialect divergence.

The stratified variant partitions every window by ``c_mktsegment``
(broadcast dim join) — per-stratum curves from the same single scan.

Reference has no survival analysis; this extends the analytics surface
(like the A/B and seasonality family in operators/experiments.py).
Independent non-SQL reference: pure-python KM in tests/test_survival.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, epoch_s, idiv
from serene_spark.registry import register


def _km_sql(dialect: str, stratified: bool) -> str:
    day = idiv(dialect, f"({epoch_s(dialect, 'o_orderdate')})", 86400)
    if stratified:
        seg_sel = "c.c_mktsegment AS seg,"
        seg_col = "seg,"
        part = "PARTITION BY seg"
        seg_out = "seg AS mktsegment,"
        join = "JOIN customer c ON c.c_custkey = o.o_custkey"
    else:
        seg_sel = "'ALL' AS seg,"
        seg_col = "seg,"
        part = "PARTITION BY seg"
        seg_out = ""
        join = ""
    return f"""
WITH ordered AS (
  SELECT {seg_sel} o.o_custkey, {day} AS day,
         LEAD({day}) OVER (PARTITION BY o.o_custkey ORDER BY {day}, o.o_orderkey)
           AS next_day
  FROM orders o {join}
),
horizon AS (
  SELECT MAX(day) AS mx FROM ordered
),
durs AS (
  -- one duration per order: observed gap to the customer's next order,
  -- or the censored gap from the last order to the observation horizon
  SELECT {seg_col}
         CASE WHEN next_day IS NULL THEN (SELECT mx FROM horizon) - day
              ELSE next_day - day END AS dur,
         CASE WHEN next_day IS NULL THEN 0 ELSE 1 END AS ev
  FROM ordered
),
hist AS (
  SELECT {seg_col} dur,
         SUM(ev) AS d,
         COUNT(*) - SUM(ev) AS c
  FROM durs GROUP BY {seg_col} dur
),
risk AS (
  SELECT {seg_col} dur, d, c,
         SUM(d + c) OVER ({part} ORDER BY dur DESC) AS n_risk
  FROM hist
),
km AS (
  SELECT {seg_col} dur, d, c, n_risk,
         SUM(CAST(CASE WHEN d < n_risk
                       THEN ROUND(LN(1 - CAST(d AS DOUBLE) / n_risk), 12)
                       ELSE 0 END AS DECIMAL(28,12)))
           OVER ({part} ORDER BY dur ASC) AS log_s,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER ({part} ORDER BY dur ASC) AS absorbed
  FROM risk
)
SELECT {seg_out}
       CAST(dur AS BIGINT) AS gap_days,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       CAST(n_risk AS BIGINT) AS n_risk,
       CASE WHEN absorbed = 1 THEN CAST(0.0 AS DOUBLE)
            ELSE ROUND(EXP(CAST(log_s AS DOUBLE)), 6) END AS survival
FROM km
ORDER BY {seg_col} gap_days
"""


def km_overall_sql(dialect: str) -> str:
    return _km_sql(dialect, stratified=False)


def km_segment_sql(dialect: str) -> str:
    return _km_sql(dialect, stratified=True)


def _q(sql_fn, tables):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        return spark.sql(sql_fn(SPARK))

    return run


register(
    "km_order_gap",
    oracle=km_overall_sql(DUCKDB),
    doc="Kaplan-Meier survival curve of time-to-next-order: consecutive "
    "gaps observed, last-order gaps right-censored at the horizon; "
    "product-limit via decimal-summed 12-dp log terms over the "
    "duration histogram (calendar-bounded, never data-scale)",
)(_q(km_overall_sql, ("orders",)))

register(
    "km_order_gap_by_segment",
    oracle=km_segment_sql(DUCKDB),
    doc="segment-stratified Kaplan-Meier repurchase curves (broadcast "
    "customer-dim join, per-segment windows over the same one scan)",
)(_q(km_segment_sql, ("orders", "customer")))
