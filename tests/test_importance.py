"""DSIR importance weighting (operators/importance.py).

Oracle parity runs in the driver gate; these pin the statistical behavior
(the score must actually separate target-like from raw documents) and the
single-tokenize-scan shape.
"""

from __future__ import annotations

import re

from serene_spark.operators.importance import (
    TARGET_SOURCES,
    doc_bucket_counts_sql,
)
from serene_spark.functions.sqlgen import SPARK
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_dsir_scores_separate_target_from_raw(spark):
    out = load_all()["dsir_importance"].spark(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    merged = out.merge(docs[["doc_id", "source"]], on="doc_id")
    is_target = merged["source"].isin(TARGET_SOURCES)
    # the importance model is estimated FROM the target slice, so target
    # docs must average a higher target-vs-raw log-likelihood ratio
    assert merged[is_target]["llr_avg"].mean() > merged[~is_target]["llr_avg"].mean()
    # selected flag consistent with the positive-sum rule
    assert ((merged["llr_sum"] > 0) == (merged["selected"] == 1)).all()
    assert len(out) == len(docs[docs["doc_id"].isin(out["doc_id"])])


def test_dsir_single_tokenize_scan(spark):
    """The (doc, bucket) count relation — the only event-sized compute —
    must read documents exactly once; everything downstream consumes the
    materialized relation."""
    from serene_spark.catalog import register_views

    register_views(spark, SF, ("documents",), spread=True)
    plan = (
        spark.sql(doc_bucket_counts_sql(SPARK))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # only documents feeds this statement, so count all file scans (the
    # plan printer may elide the path when the scan line is long)
    scans = len(re.findall(r"FileScan parquet", plan))
    assert scans == 1, plan


def test_dsir_deterministic(spark):
    q = load_all()["dsir_importance"]
    a = q.spark(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = q.spark(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_weighted_sample_prefers_target_like_docs(spark):
    """A-Res with weights exp(llr_avg) must (a) hit the target fraction
    within tie slack, (b) oversample high-llr docs relative to uniform —
    the importance-resampling property."""
    out = load_all()["dsir_weighted_sample"].spark(spark, SF).toPandas()
    n = len(out)
    k = (out["sampled"] == 1).sum()
    import math

    assert k >= math.ceil(0.25 * n)            # threshold rule guarantees >= frac
    assert k <= math.ceil(0.25 * n) + 5        # ...with only tie slack above
    mean_sampled = out[out.sampled == 1]["llr_avg"].mean()
    mean_all = out["llr_avg"].mean()
    assert mean_sampled > mean_all             # weighting pulls toward target
    # deterministic: same call, same sample
    again = load_all()["dsir_weighted_sample"].spark(spark, SF).toPandas()
    assert set(out[out.sampled == 1]["doc_id"]) == set(again[again.sampled == 1]["doc_id"])
