"""Natural-language date parsing in the type-inference cascade.

Re-expression of jchronic (reference DataTypeParser.scala:75-128): month-name
dates, bare weekday/month names, and month-name datetimes classify as
Date/DateTime, and the classification is identical on Spark and DuckDB.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.operators.profile_typeinfer import classify_expr

CASES = [
    ("Jan 3, 1998", "Date"),
    ("january 3 1998", "Date"),
    ("3rd of May 2001", "Date"),
    ("15 March 1998", "Date"),
    ("03-Mar-98", "Date"),
    ("May 2001", "Date"),
    ("March 15", "Date"),
    ("Tuesday", "Date"),
    ("wednesday", "Date"),
    ("August", "Date"),
    ("Jan 3, 1998 10:30 pm", "DateTime"),
    ("3 May 2001 08:15:00", "DateTime"),
    # non-dates that look close
    ("maybe", "String"),
    ("sundae", "String"),
    ("march of dimes", "String"),
    ("hello world", "String"),
    # existing cascade unchanged
    ("1998", "Date"),
    ("12:30", "Time"),
    ("3.14", "Float"),
    ("42", "Integer"),
    # reference booleans are the single chars 0/1/T/F/Y/N only
    # (booleanRegex, DataTypeParser.scala:16) — word forms are String
    ("true", "String"),
    ("T", "Boolean"),
    ("2024-01-05", "Date"),
    ("2024-01-05 10:30:00", "DateTime"),
]


def _sql(dialect: str, values_rel: str) -> str:
    return f"SELECT value, {classify_expr(dialect)} AS t FROM {values_rel}"


def test_nl_date_classification_spark(spark):
    rows = ", ".join(f"('{v}')" for v, _ in CASES)
    got = {
        r["value"]: r["t"]
        for r in spark.sql(_sql(SPARK, f"(VALUES {rows} AS v(value))")).collect()
    }
    assert got == {v: t for v, t in CASES}


def test_nl_date_classification_duckdb(duck):
    rows = ", ".join(f"('{v}')" for v, _ in CASES)
    got = dict(duck.sql(_sql(DUCKDB, f"(VALUES {rows}) AS v(value)")).fetchall())
    assert got == {v: t for v, t in CASES}
