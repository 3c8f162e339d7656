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
  re-expressed as the NL_DATE_* / WEEKDAY regex family below: month-name
  dates ("Jan 3, 1998", "3rd of May 2001", "May 2001", "03-Mar-98"), bare
  weekday/month names, and month-name datetimes — the formats jchronic's
  grammar accepts that a type-inference corpus actually contains. Running
  jchronic itself would need a per-row JVM/Python call (the slow path); a
  regex cascade stays inside whole-stage codegen in both dialects;
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

# Natural-language date family (jchronic re-expression, DataTypeParser.scala:75-128).
# All patterns run on lower(trim(value)); no backslash escapes (dialect rule).
_MONTH = (
    "(jan(uary)?|feb(ruary)?|mar(ch)?|apr(il)?|may|jun(e)?|jul(y)?"
    "|aug(ust)?|sep(t(ember)?)?|oct(ober)?|nov(ember)?|dec(ember)?)"
)
_DAY = "[0-9]{1,2}(st|nd|rd|th)?"
_SEP = "[ .,-]+"
_TIME_TAIL = "[0-9]{1,2}:[0-9]{2}(:[0-9]{2})?( ?(am|pm))?"
# "jan 3, 1998" / "march 15" / "may 2001"
NL_DATE_MDY = f"^{_MONTH}{_SEP}{_DAY}({_SEP}[0-9]{{2,4}})?$"
NL_DATE_MY = f"^{_MONTH}{_SEP}[0-9]{{4}}$"
# "3rd of may 2001" / "15 march 1998" / "03-mar-98"
NL_DATE_DMY = f"^{_DAY}{_SEP}(of )?{_MONTH}({_SEP}[0-9]{{2,4}})?$"
# bare weekday / month name ("tuesday", "august") — jchronic resolves both
WEEKDAY_PAT = "^((mon|tue(s)?|wed(nes)?|thu(r(s)?)?|fri|sat(ur)?|sun)(day)?)$"
NL_MONTH_ONLY = f"^{_MONTH}$"
# month-name datetime: "jan 3, 1998 10:30 pm"
NL_DATETIME1 = f"^{_MONTH}{_SEP}{_DAY}({_SEP}[0-9]{{2,4}})?{_SEP}{_TIME_TAIL}$"
NL_DATETIME2 = f"^{_DAY}{_SEP}(of )?{_MONTH}({_SEP}[0-9]{{2,4}})?{_SEP}{_TIME_TAIL}$"


def _nl_date(dialect: str, lv: str) -> str:
    pats = (NL_DATE_MDY, NL_DATE_MY, NL_DATE_DMY, WEEKDAY_PAT, NL_MONTH_ONLY)
    return "(" + " OR ".join(rx(dialect, lv, p) for p in pats) + ")"


def _nl_datetime(dialect: str, lv: str) -> str:
    return "(" + " OR ".join(rx(dialect, lv, p) for p in (NL_DATETIME1, NL_DATETIME2)) + ")"


def classify_expr(dialect: str, value: str = "trim(value)") -> str:
    """The reference's per-value type cascade as one CASE expression."""
    lv = f"lower({value})"
    return f"""CASE
      WHEN {rx(dialect, value, FLOAT_PAT)} THEN 'Float'
      WHEN lower({value}) IN ('true', 'false', 'yes', 'no') THEN 'Boolean'
      WHEN {rx(dialect, value, YEAR_PAT)} THEN 'Date'
      WHEN {rx(dialect, value, INT_PAT)} THEN 'Integer'
      WHEN {rx(dialect, value, LONG_PAT)} THEN 'Long'
      WHEN {rx(dialect, value, TIME_PAT)} THEN 'Time'
      WHEN {rx(dialect, value, DATETIME_PAT)} THEN 'DateTime'
      WHEN {_nl_datetime(dialect, lv)} THEN 'DateTime'
      WHEN {rx(dialect, value, DATE_PAT)} THEN 'Date'
      WHEN {_nl_date(dialect, lv)} THEN 'Date'
      ELSE 'String'
    END"""


def typeinfer_sql(long_rel: str, dialect: str) -> str:
    """Majority-vote inferred type per column, with vote counts."""
    return f"""
WITH typed AS (
  -- classify per row, then one narrow (column, type) aggregation: the
  -- 8-value type domain makes map-side combine collapse everything before
  -- the shuffle. (A (column, value) histogram first was measured SLOWER on
  -- mostly-distinct columns — the extra wide shuffle outweighs running the
  -- regex cascade once per distinct value.)
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
