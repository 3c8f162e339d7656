"""melt_ids (int-column-id melt, guide §2.3 narrower shuffle keys) must be a
pure re-keying of melt: mapping ids back through the returned CASE expression
reproduces the string melt exactly, so every per-column aggregate downstream
is unchanged by construction. Pinned here directly (the 363-query parity
sweep pins the aggregates end to end)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from serene_spark.catalog import COLUMNS, load_table
from serene_spark.functions.melt import melt, melt_ids


def test_melt_ids_maps_back_to_string_melt(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    expected = Counter(
        (r.column_name, r.value) for r in melt(df).collect()
    )
    long_df, name_case = melt_ids(df)
    mapped = Counter(
        (r.column_name, r.value)
        for r in long_df.withColumn("column_name", F.expr(name_case)).collect()
    )
    assert mapped == expected


def test_melt_ids_key_is_int_and_case_is_bijective(spark, sf_dir):
    df = load_table(spark, sf_dir, "nation")
    long_df, name_case = melt_ids(df)
    assert dict(long_df.dtypes)["column_name"] == "int"
    ids = sorted(r[0] for r in long_df.select("column_name").distinct().collect())
    assert ids == list(range(len(COLUMNS["nation"])))
    names = {
        r[0]
        for r in long_df.select(F.expr(name_case)).distinct().collect()
    }
    assert names == set(COLUMNS["nation"])


def test_profile_scalar_unchanged_by_id_keying(spark, sf_dir):
    """The registered runner (ids) equals the one-pass statement over the
    plain string melt, row for row."""
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.profile_scalar import (
        hist_sql,
        profile_scalar,
        scalar_onepass_sql,
    )

    melt(load_table(spark, sf_dir, "supplier")).createOrReplaceTempView(
        "__melt_ids_test_long"
    )
    via_strings = spark.sql(
        f"WITH hist AS ({hist_sql('__melt_ids_test_long')}),\n"
        + scalar_onepass_sql(SPARK, "hist")
    )
    via_ids = profile_scalar(spark, sf_dir, "supplier")
    key = sorted(via_strings.columns)
    a = sorted(map(tuple, via_strings.select(*key).collect()))
    b = sorted(map(tuple, via_ids.select(*key).collect()))
    assert a == b
