"""Exact gold values ported from the reference's FeatureExtractorSpec
(matcher/src/test/scala/.../features/FeatureExtractorSpec.scala) — direct
reference parity on the reference's own tiny fixtures, independent of the
DuckDB oracle."""

from __future__ import annotations

import pytest

from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.profile_scalar import profile_scalar_sql


def _profile(spark, values):
    df = spark.createDataFrame([("testAttr", v) for v in values], "column_name string, value string")
    df.createOrReplaceTempView("__gold_long")
    return spark.sql(profile_scalar_sql("__gold_long", SPARK)).collect()[0]


def test_num_unique_values(spark):
    # FeatureExtractorSpec.scala:28-34
    row = _profile(spark, ["asdf", "foobar", "foobaz", "asdf"])
    assert row["num_unique_vals"] == 3


@pytest.mark.parametrize(
    "values,expected",
    [
        (["1asdf", "foba0", "o9baz", "a8sdf"], 0.2),                 # :41
        (["", "foba0", "o9baz", "a8sdf"], 0.15000000000000002),      # :44
        (["", "", "", ""], 0.0),                                     # :47
    ],
)
def test_numerical_char_ratio(spark, values, expected):
    row = _profile(spark, values)
    assert row["prop_numerical_chars"] == pytest.approx(expected, abs=1e-6)


@pytest.mark.parametrize(
    "values,expected",
    [
        ([" asdf", "foba ", "o baz", "a sdf"], 0.2),                 # :56
        (["", "foba ", "o baz", "a sdf"], 0.15000000000000002),      # :59
        (["", "", "", ""], 0.0),                                     # :62
    ],
)
def test_whitespace_ratio(spark, values, expected):
    row = _profile(spark, values)
    assert row["prop_whitespace_chars"] == pytest.approx(expected, abs=1e-6)


# DataTypeParserSpec.scala gold cases (:64-155)
TYPE_GOLD = [
    ("12.345", "Float"),
    ("June 22, 1984", "Date"),
    ("-1234", "Integer"),
    ("The quick brown fox.", "String"),
    ("61430440622", "Long"),
    ("0430440622", "Integer"),       # parses into int32 despite 10 digits
    ("T", "Boolean"), ("F", "Boolean"), ("t", "Boolean"), ("f", "Boolean"),
    ("Y", "Boolean"), ("N", "Boolean"), ("y", "Boolean"), ("n", "Boolean"),
    ("0", "Boolean"), ("1", "Boolean"),
    ("1:00pm", "Time"),
    ("100pm", "Time"),
    ("2015", "Date"),
    ("Jan 13, 2012", "Date"),
    ("15/10/2014", "Date"),
    ("15-10-2014", "Date"),
    ("January 13, 2012", "Date"),
    ("January 13, 2012 12:00AM", "DateTime"),
    ("15-10-2014 21:00 PM", "DateTime"),
    ("21:00 PM 15-10-2014", "DateTime"),
    ("02010", "Integer"),
    ("febr", "String"),
    ("$3,500", "String"),
]


def test_type_cascade_gold_spark(spark):
    from serene_spark.operators.profile_typeinfer import classify_expr

    rows = ", ".join(f"('{v}')" for v, _ in TYPE_GOLD)
    got = {
        r["value"]: r["t"]
        for r in spark.sql(
            f"SELECT value, {classify_expr(SPARK)} AS t FROM (VALUES {rows} AS v(value))"
        ).collect()
    }
    assert got == dict(TYPE_GOLD)


def test_type_cascade_gold_duckdb(duck):
    from serene_spark.functions.sqlgen import DUCKDB
    from serene_spark.operators.profile_typeinfer import classify_expr

    rows = ", ".join(f"('{v}')" for v, _ in TYPE_GOLD)
    got = dict(
        duck.sql(
            f"SELECT value, {classify_expr(DUCKDB)} AS t FROM (VALUES {rows}) AS v(value)"
        ).fetchall()
    )
    assert got == dict(TYPE_GOLD)
