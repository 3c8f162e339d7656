"""Feature-engineering operators for tabular ML pipelines — smoothed target
encoding and weight-of-evidence / information-value scoring, the two
categorical-encoding staples a training-data platform ships beside its
profiling stack (the scalar/type-inference features in operators/profile_*).

* ``target_encode_event_type`` — m-estimate (smoothed) mean-target encoding
  of the categorical ``event_type`` against the continuous ``value`` target:
  enc = (Σy + m·ȳ_global)/(n + m), m = ``SMOOTH_M``.  Σy is an exact DECIMAL
  sum (cents-quantized), counts are integers, so the encoding is
  aggregation-order exact.  The smoothing is what makes the encoding safe
  for rare categories (a 1-row category shrinks to the global mean instead
  of memorizing its single target — the classic target-leak failure).
* ``woe_iv_discount`` — weight of evidence per discount bin against the
  binary "returned" label (l_returnflag = 'R'), plus the feature's total
  information value: WoE_b = ln((good_b/good_tot)/(bad_b/bad_tot)),
  IV = Σ_b (good share − bad share)·WoE_b.  All shares are exact integer
  ratios; only the final ln is floating point (rounded 6 dp).  Degenerate
  bins (zero goods or zero bads) yield NULL WoE and are excluded from IV —
  stated, not silent.

Scale: each is ONE scan → one keyed agg on a constant-cardinality key (+ a
broadcast 1-row global relation).  Nothing shuffles at data scale.
"""

from __future__ import annotations

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, mat
from serene_spark.registry import register

SMOOTH_M = 20


def _target_encode_sql(dialect: str) -> str:
    v = "CAST(value AS DECIMAL(18,2))"
    return f"""
WITH g AS {mat(dialect)}(
  SELECT COUNT(*) AS n_tot, SUM({v}) AS s_tot
  FROM events WHERE value IS NOT NULL
),
per AS (
  SELECT event_type, COUNT(*) AS n, SUM({v}) AS s
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT per.event_type,
       CAST(per.n AS BIGINT) AS n,
       ROUND(CAST(per.s AS DOUBLE) / per.n, 6) AS mean_raw,
       ROUND((CAST(per.s AS DOUBLE) + {SMOOTH_M} * CAST(g.s_tot AS DOUBLE) / g.n_tot)
             / (per.n + {SMOOTH_M}), 6) AS enc_smoothed,
       ROUND(CAST(g.s_tot AS DOUBLE) / g.n_tot, 6) AS global_mean
FROM per JOIN g ON 1 = 1
ORDER BY event_type
"""


register(
    "target_encode_event_type",
    oracle=_target_encode_sql(DUCKDB),
    doc=f"m-estimate smoothed mean-target encoding (m={SMOOTH_M}) of "
    "event_type against value: exact decimal sums + integer counts, "
    "rare categories shrink to the global mean",
)(lambda spark, sf_dir: (
    register_views(spark, sf_dir, ("events",)),
    spark.sql(_target_encode_sql(SPARK)),
)[1])


def _woe_sql(dialect: str) -> str:
    return f"""
WITH bins AS (
  SELECT CAST(l_discount AS DECIMAL(18,2)) AS discount,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad,
         SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS good
  FROM lineitem
  GROUP BY CAST(l_discount AS DECIMAL(18,2))
),
tot AS {mat(dialect)}(
  SELECT SUM(bad) AS bad_tot, SUM(good) AS good_tot FROM bins
),
scored AS (
  SELECT b.discount, b.good, b.bad,
         CASE WHEN b.good = 0 OR b.bad = 0 THEN NULL
              ELSE ln((CAST(b.good AS DOUBLE) / t.good_tot)
                      / (CAST(b.bad AS DOUBLE) / t.bad_tot)) END AS woe,
         CASE WHEN b.good = 0 OR b.bad = 0 THEN NULL
              ELSE (CAST(b.good AS DOUBLE) / t.good_tot
                    - CAST(b.bad AS DOUBLE) / t.bad_tot)
                   * ln((CAST(b.good AS DOUBLE) / t.good_tot)
                        / (CAST(b.bad AS DOUBLE) / t.bad_tot)) END AS iv_contrib
  FROM bins b JOIN tot t ON 1 = 1
),
iv AS (
  SELECT SUM(CAST(ROUND(iv_contrib, 12) AS DECIMAL(20,12))) AS iv_total
  FROM scored WHERE iv_contrib IS NOT NULL
)
SELECT ROUND(CAST(s.discount AS DOUBLE), 2) AS discount,
       CAST(s.good AS BIGINT) AS n_good,
       CAST(s.bad AS BIGINT) AS n_bad,
       ROUND(s.woe, 6) AS woe,
       ROUND(s.iv_contrib, 6) AS iv_contrib,
       ROUND(CAST(i.iv_total AS DOUBLE), 6) AS iv_total
FROM scored s JOIN iv i ON 1 = 1
ORDER BY discount
"""


register(
    "woe_iv_discount",
    oracle=_woe_sql(DUCKDB),
    doc="Weight-of-evidence per discount bin against the returned label + "
    "total information value: exact integer shares, ln only at the edge, "
    "degenerate bins NULL and excluded from IV",
)(lambda spark, sf_dir: (
    register_views(spark, sf_dir, ("lineitem",)),
    spark.sql(_woe_sql(SPARK)),
)[1])
