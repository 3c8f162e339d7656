"""stats-of-text-length and stats-of-numerical-type group features (SURVEY §2.4).

Reference: 5 stats (mean/median/mode/min/max) over ``length(value)``
(matcher/.../features/FeatureExtractor.scala:736-775, DataPreprocessor.scala:239-260)
and over parseable numeric values (FeatureExtractor.scala:778-839).

Parity-critical semantics preserved exactly:
- the reference's nonstandard median = the ceil(n/2)-th smallest element
  (FeatureExtractor.scala:758-763) — implemented with row_number, NOT
  percentile_approx (which would diverge);
- mode = value with max count, ties broken to the smallest value;
- -1 sentinels when fewer than 2 values.

Numeric means go through DECIMAL(28,10) sums so the result is independent of
partial-aggregation order on both engines; the numeric-detection regex is
restricted to decimal-castable forms (no exponents) for exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import COLUMNS, load_table
from serene_spark.functions.melt import melt, melt_sql
from serene_spark.functions.sqlgen import DUCKDB, SPARK, rx
from serene_spark.registry import register

NUM_PAT = "^[+-]?([0-9]{1,18}([.][0-9]{0,10})?|[.][0-9]{1,10})$"


def textlen_stats_sql(long_rel: str, dialect: str) -> str:
    return f"""
WITH lens AS (
  SELECT column_name, CAST(length(value) AS BIGINT) AS len FROM {long_rel} AS lr
),
agg AS (
  SELECT column_name, CAST(COUNT(*) AS BIGINT) AS n,
         round(avg(CAST(len AS DOUBLE)), 6) AS mean_len,
         CAST(MIN(len) AS BIGINT) AS min_len,
         CAST(MAX(len) AS BIGINT) AS max_len
  FROM lens GROUP BY column_name
),
ranked AS (
  SELECT column_name, len,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY len) AS rn
  FROM lens
),
med AS (
  SELECT r.column_name, CAST(r.len AS BIGINT) AS median_len
  FROM ranked r JOIN agg a ON r.column_name = a.column_name
  WHERE r.rn = CAST(ceil(a.n / 2.0) AS BIGINT)
),
mode_counts AS (
  SELECT column_name, len, COUNT(*) AS c FROM lens GROUP BY column_name, len
),
mode1 AS (
  SELECT column_name, CAST(len AS BIGINT) AS mode_len
  FROM (
    SELECT column_name, len,
           ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY c DESC, len ASC) AS rn
    FROM mode_counts
  ) mc WHERE rn = 1
)
SELECT a.column_name, a.n AS n_values, a.mean_len,
       CASE WHEN a.n < 2 THEN -1 ELSE m.median_len END AS median_len,
       mo.mode_len, a.min_len, a.max_len
FROM agg a
JOIN med m ON a.column_name = m.column_name
JOIN mode1 mo ON a.column_name = mo.column_name
"""


def numeric_stats_sql(long_rel: str, dialect: str) -> str:
    num = "CAST(trim(value) AS DECIMAL(28,10))"
    return f"""
WITH nums AS (
  SELECT column_name, {num} AS num
  FROM {long_rel} AS lr
  WHERE {rx(dialect, 'trim(value)', NUM_PAT)}
),
agg AS (
  SELECT column_name, CAST(COUNT(*) AS BIGINT) AS n_numeric,
         round(CAST(SUM(num) AS DOUBLE) / COUNT(*), 6) AS mean_num,
         CAST(MIN(num) AS DOUBLE) AS min_num,
         CAST(MAX(num) AS DOUBLE) AS max_num
  FROM nums GROUP BY column_name
),
ranked AS (
  SELECT column_name, num,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY num) AS rn
  FROM nums
),
med AS (
  SELECT r.column_name, CAST(r.num AS DOUBLE) AS median_num
  FROM ranked r JOIN agg a ON r.column_name = a.column_name
  WHERE r.rn = CAST(ceil(a.n_numeric / 2.0) AS BIGINT)
)
SELECT a.column_name, a.n_numeric, a.mean_num, m.median_num, a.min_num, a.max_num
FROM agg a JOIN med m ON a.column_name = m.column_name
"""


def _make(sql_fn, table: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        view = f"__serene_long_{table}"
        melt(load_table(spark, sf_dir, table)).createOrReplaceTempView(view)
        return spark.sql(sql_fn(view, SPARK))

    return run


for _t in ("customer", "part", "documents"):
    register(
        f"textlen_stats_{_t}",
        oracle=textlen_stats_sql(melt_sql(_t, COLUMNS[_t]), DUCKDB),
        doc=f"SURVEY §2.4 stats-of-text-length over `{_t}`",
    )(_make(textlen_stats_sql, _t))

for _t in ("customer", "lineitem"):
    register(
        f"numeric_stats_{_t}",
        oracle=numeric_stats_sql(melt_sql(_t, COLUMNS[_t]), DUCKDB),
        doc=f"SURVEY §2.4 stats-of-numerical-type over `{_t}`",
    )(_make(numeric_stats_sql, _t))
