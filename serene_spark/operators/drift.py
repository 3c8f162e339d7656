"""Distribution-drift detection between two corpus snapshots: the
Kolmogorov–Smirnov statistic and the Population Stability Index per
event_type over ``value`` — the monitoring gate an ML pipeline runs before
trusting a model trained on the old snapshot (feature drift → retrain).

Both compare the "reference" slice (events before SPLIT_TS — the training
window) against the "current" slice (at/after).

Numeric determinism:

* KS is computed EXACTLY in integers: D = max |cum_a·n_b − cum_b·n_a| /
  (n_a·n_b) — the maximization runs over integer cross-products, so no
  float comparison can reorder it; the single division happens once at the
  end.
* PSI's per-bin ``(p_a − p_b)·ln(p_a/p_b)`` terms are rounded to 9 dp and
  summed as DECIMAL(18,9) (engine convention for log sums), with +0.5
  Laplace smoothing so empty bins stay finite.

Scale shape (100 TB): ONE scan — each side is a CASE arm, never two reads;
the event-cardinality reduce keys on (type, value) (high cardinality);
the CDF window and the 10-bin PSI run over the tiny distinct-value /
bin relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, explode_seq
from serene_spark.registry import register

from serene_spark.operators.matview import SPLIT_TS  # shared snapshot boundary

PSI_BINS = 10
# KS flags at the SIZE-SCALED critical value c(alpha)*sqrt((na+nb)/(na*nb)),
# not a fixed D: the statistic's null distribution shrinks as 1/sqrt(n), so a
# constant threshold flags pure sampling noise on small slices and misses
# real shifts on large ones.  c = 1.95 ~ alpha = 0.001.
KS_CRIT_C = "1.95"
PSI_THRESHOLD = 0.2  # the conventional "significant shift" PSI level

_SIDE_A = f"ts < TIMESTAMP '{SPLIT_TS}'"


def _counts_rel(dialect: str) -> str:
    """(event_type, value, count_ref, count_cur) — one scan, both sides."""
    return f"""
counts AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         SUM(CASE WHEN {_SIDE_A} THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN {_SIDE_A} THEN 0 ELSE 1 END) AS cb
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(value AS DECIMAL(18,2))
)"""


def drift_ks_sql(dialect: str) -> str:
    return f"""
WITH {_counts_rel(dialect)},
cum AS (
  SELECT event_type,
         SUM(ca) OVER (PARTITION BY event_type ORDER BY v) AS cum_a,
         SUM(cb) OVER (PARTITION BY event_type ORDER BY v) AS cum_b,
         SUM(ca) OVER (PARTITION BY event_type) AS na,
         SUM(cb) OVER (PARTITION BY event_type) AS nb
  FROM counts
),
d AS (
  -- DECIMAL(18,0) factors: BIGINT*BIGINT cross-products would silently
  -- wrap once a side passes ~3e9 rows per type; 18+18+1 = 37 <= 38 keeps
  -- the decimal product exact to 1e18-row sides
  SELECT event_type, na, nb,
         MAX(abs(CAST(cum_a AS DECIMAL(18,0)) * CAST(nb AS DECIMAL(18,0))
                 - CAST(cum_b AS DECIMAL(18,0)) * CAST(na AS DECIMAL(18,0)))) AS d_scaled
  FROM cum GROUP BY event_type, na, nb
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_ref,
       CAST(nb AS BIGINT) AS n_cur,
       -- a type on only ONE side of the split is definitional drift
       -- (sup-gap D = 1 against an empty distribution); without the guard
       -- the 0-denominator NULLs would fall through CASE to drifted = 0
       CASE WHEN na = 0 OR nb = 0 THEN 1.0
            ELSE ROUND(CAST(d_scaled AS DOUBLE)
                       / (CAST(na AS DOUBLE) * nb), 6) END AS ks_stat,
       CASE WHEN na = 0 OR nb = 0 THEN NULL
            ELSE ROUND({KS_CRIT_C} * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb)), 6)
            END AS ks_crit,
       CASE WHEN na = 0 OR nb = 0 THEN 1
            WHEN CAST(d_scaled AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
                 >= {KS_CRIT_C} * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb))
            THEN 1 ELSE 0 END AS drifted
FROM d
"""


def drift_psi_sql(dialect: str) -> str:
    """PSI over {PSI_BINS} equi-width bins spanning each type's global
    [min, max] (both sides share the binning — drift must come from mass
    movement, not bin-edge changes)."""
    return f"""
WITH {_counts_rel(dialect)},
edges AS (
  SELECT event_type, MIN(v) AS lo, MAX(v) AS hi,
         SUM(ca) AS na, SUM(cb) AS nb
  FROM counts GROUP BY event_type
),
binned AS (
  SELECT c.event_type,
         LEAST({PSI_BINS} - 1, CAST(FLOOR((c.v - e.lo) / ((e.hi - e.lo + 0.01) / {PSI_BINS})) AS INT)) AS bin_id,
         SUM(c.ca) AS ca, SUM(c.cb) AS cb
  FROM counts c JOIN edges e ON c.event_type = e.event_type
  GROUP BY c.event_type, 2
),
spine AS (
  -- every (type, bin) — a bin empty on BOTH sides still carries a small
  -- smoothed term (the denominators differ), so it must not vanish from
  -- the sum just because no value hashed into it
  SELECT e.event_type, e.na, e.nb, {explode_seq(dialect, 0, PSI_BINS - 1)} AS bin_id
  FROM edges e
),
terms AS (
  SELECT s.event_type,
         CAST(ROUND(
           ((COALESCE(b.ca, 0) + 0.5) / (s.na + {PSI_BINS} * 0.5)
            - (COALESCE(b.cb, 0) + 0.5) / (s.nb + {PSI_BINS} * 0.5))
           * LN(((COALESCE(b.ca, 0) + 0.5) / (s.na + {PSI_BINS} * 0.5))
                / ((COALESCE(b.cb, 0) + 0.5) / (s.nb + {PSI_BINS} * 0.5))), 9)
         AS DECIMAL(18,9)) AS term
  FROM spine s
  LEFT JOIN binned b ON s.event_type = b.event_type AND s.bin_id = b.bin_id
)
SELECT event_type,
       CAST(ROUND(SUM(term), 6) AS DOUBLE) AS psi,
       CASE WHEN SUM(term) >= {PSI_THRESHOLD} THEN 1 ELSE 0 END AS drifted
FROM terms
GROUP BY event_type
"""


def _events_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("events",))
        return spark.sql(sql_fn(SPARK))

    return run


register(
    "drift_ks_events",
    oracle=drift_ks_sql(DUCKDB),
    doc="Kolmogorov-Smirnov drift statistic per event type between the "
    "training window and current slice — integer-exact maximization",
)(_events_query(drift_ks_sql))

register(
    "drift_psi_events",
    oracle=drift_psi_sql(DUCKDB),
    doc=f"Population Stability Index over {PSI_BINS} shared equi-width "
    "bins, Laplace-smoothed, decimal-exact term sums",
)(_events_query(drift_psi_sql))
