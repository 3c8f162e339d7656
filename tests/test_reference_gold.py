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
