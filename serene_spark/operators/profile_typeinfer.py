"""Inferred-data-type group feature (SURVEY §2.4).

Reference cascade: Float -> Boolean -> Integer (4-digit 1500..now+500 => Date)
-> Long -> Time -> DateTime -> Date -> String, decided per value then majority
vote per column (matcher/.../nlptools/parser/DataTypeParser.scala:23-55,
sampling in matcher/.../matcher/features/DataPreprocessor.scala:172-210).

Divergences, by design:
- the reference votes over a 100-value sample (seed 18371623); we vote over
  ALL values so the DuckDB oracle verifies exactly — same complexity class,
  one aggregation either way;
- jchronic natural-language date parsing (DataTypeParser.scala:75-128) is
  approximated by the explicit date/time regexes below (the NL parser is only
  reachable through formats these patterns cover in the test corpora);
- "now + 500" is frozen at 2526 so results do not drift with wall-clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import COLUMNS, load_table
from serene_spark.functions.melt import melt, melt_sql
from serene_spark.functions.sqlgen import DUCKDB, SPARK, rx
from serene_spark.registry import register

FLOAT_PAT = "^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$"
INT_PAT = "^[+-]?[0-9]{1,9}$"
YEAR_PAT = "^(1[5-9][0-9][0-9]|2[0-4][0-9][0-9]|25[01][0-9]|252[0-6])$"  # 1500..2526
LONG_PAT = "^[+-]?[0-9]{10,18}$"
TIME_PAT = "^[0-9]{1,2}:[0-9]{2}(:[0-9]{2})?$"
DATETIME_PAT = "^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}(:[0-9]{2})?([.][0-9]+)?$"
DATE_PAT = "(^[0-9]{4}-[0-9]{2}-[0-9]{2}$)|(^[0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4}$)"


def classify_expr(dialect: str, value: str = "trim(value)") -> str:
    """The reference's per-value type cascade as one CASE expression."""
    return f"""CASE
      WHEN {rx(dialect, value, FLOAT_PAT)} THEN 'Float'
      WHEN lower({value}) IN ('true', 'false', 'yes', 'no') THEN 'Boolean'
      WHEN {rx(dialect, value, YEAR_PAT)} THEN 'Date'
      WHEN {rx(dialect, value, INT_PAT)} THEN 'Integer'
      WHEN {rx(dialect, value, LONG_PAT)} THEN 'Long'
      WHEN {rx(dialect, value, TIME_PAT)} THEN 'Time'
      WHEN {rx(dialect, value, DATETIME_PAT)} THEN 'DateTime'
      WHEN {rx(dialect, value, DATE_PAT)} THEN 'Date'
      ELSE 'String'
    END"""


def typeinfer_sql(long_rel: str, dialect: str) -> str:
    """Majority-vote inferred type per column, with vote counts."""
    return f"""
WITH typed AS (
  SELECT column_name, {classify_expr(dialect)} AS inferred
  FROM {long_rel} AS lr
  WHERE length(trim(value)) > 0
),
votes AS (
  SELECT column_name, inferred, CAST(COUNT(*) AS BIGINT) AS votes
  FROM typed GROUP BY column_name, inferred
),
tot AS (
  SELECT column_name, CAST(SUM(votes) AS BIGINT) AS n FROM votes GROUP BY column_name
),
ranked AS (
  SELECT column_name, inferred, votes,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY votes DESC, inferred ASC) AS rn
  FROM votes
)
SELECT r.column_name, r.inferred AS inferred_type, r.votes AS type_votes,
       round(CAST(r.votes AS DOUBLE) / t.n, 6) AS type_prop
FROM ranked r JOIN tot t ON r.column_name = t.column_name
WHERE r.rn = 1
"""


def _make(table: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        view = f"__serene_long_{table}"
        melt(load_table(spark, sf_dir, table)).createOrReplaceTempView(view)
        return spark.sql(typeinfer_sql(view, SPARK))

    return run


for _t in ("customer", "orders", "events", "lineitem"):
    register(
        f"typeinfer_{_t}",
        oracle=typeinfer_sql(melt_sql(_t, COLUMNS[_t]), DUCKDB),
        doc=f"SURVEY §2.4 inferred-data-type majority vote over `{_t}`",
    )(_make(_t))
