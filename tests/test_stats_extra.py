"""Correlation matrix + revenue concentration (operators/stats_extra.py)."""

from __future__ import annotations

import re

import numpy as np

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_corr_matches_numpy_and_single_scan(spark):
    q = load_all()["corr_lineitem"]
    out = {(r["col_a"], r["col_b"]): r["pearson_r"] for r in q.spark(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    for (a, b), r in out.items():
        # decimal(18,2)-cast inputs, like the operator
        xa = li[a].round(2).to_numpy()
        xb = li[b].round(2).to_numpy()
        ref = np.corrcoef(xa, xb)[0, 1]
        assert abs(r - round(ref, 6)) < 1e-5, (a, b, r, ref)
    assert len(out) == 6  # C(4,2) pairs
    plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 1  # one scan, all pairs


def test_concentration_matches_numpy(spark):
    out = load_all()["customer_spend_concentration"].spark(spark, SF).toPandas()
    cust = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    rev = (
        orders.assign(r=orders["o_totalprice"].round(2))
        .groupby("o_custkey")["r"].sum()
        .reindex(cust["c_custkey"], fill_value=0.0)
        .to_numpy()
    )
    # shares
    assert abs(out["revenue_share"].sum() - 1.0) < 1e-4
    assert out["n_customers"].sum() == len(cust)
    # gini reference over the grouped piecewise-linear Lorenz curve
    srt = np.sort(rev)
    n, t = len(srt), srt.sum()
    cum = np.cumsum(srt)
    g_ref = 1 - np.sum((1 / n) * (2 * cum - srt) / t)
    gini = out["gini"].iloc[0]
    assert (out["gini"] == gini).all()
    assert abs(gini - round(g_ref, 6)) < 1e-4, (gini, g_ref)
    # ABC ordering: A-class customers are fewer but hold more revenue
    rows = out.set_index("abc_class")
    if "A" in rows.index and "C" in rows.index:
        assert rows.loc["A", "revenue_share"] >= rows.loc["C", "revenue_share"]
