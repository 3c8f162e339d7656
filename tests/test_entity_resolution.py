"""Entity resolution (operators/entity_resolution.py).

The dirty source is derived from customer, so ground truth is known:
these tests measure the MATCHING QUALITY (precision/recall of the scoring
pipeline), the blocking reduction, and the plan shape.  Oracle parity runs
in the driver gate.
"""

from __future__ import annotations

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_er_perfect_precision_and_recall_on_derived_truth(spark):
    matches = load_all()["er_match_customer"].spark(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    # ground truth: dirty_id == c_custkey (the dirty source is a reformat)
    assert len(matches) == n_cust  # full recall
    assert all(r["dirty_id"] == r["matched_custkey"] for r in matches)  # full precision
    assert all(r["score"] >= 0.62 for r in matches)


def test_er_blocking_reduces_candidates(spark):
    stats = load_all()["er_blocking_stats"].spark(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    total_candidates = sum(r["n_candidates"] for r in stats)
    # blocking must beat the cross join by a wide margin...
    assert total_candidates < 0.1 * n_cust * n_cust
    # ...while every record still meets its true match (recall preserved):
    # guaranteed because block keys derive identically from both sides.
    assert total_candidates >= n_cust


def test_er_score_separation(spark):
    """True pairs and best false pairs must be separated by a real margin —
    the property the threshold calibration rests on."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.entity_resolution import _pairs_sql

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from serene_spark.operators.pair_features import _jaro

    register_views(spark, SF, ("customer",))
    spark.udf.register(
        "__er_jaro",
        pandas_udf(lambda a, b: pd.Series([_jaro(x, y) for x, y in zip(a, b)]), DoubleType()),
    )
    sql = _pairs_sql(SPARK, "__er_jaro(d.d_name, c.c_name_norm)") + """
SELECT MIN(CASE WHEN dirty_id = c_custkey THEN score END) AS min_true,
       MAX(CASE WHEN dirty_id <> c_custkey THEN score END) AS max_false
FROM pairs"""
    row = spark.sql(sql).collect()[0]
    assert row["min_true"] > row["max_false"] + 0.05
