"""Estimation family (operators/estimation.py): numpy/pandas pins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _orders_by_nation():
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["v"] = np.round(df.o_totalprice.astype(float), 2)
    return df


def test_jackknife_matches_numpy(spark):
    out = load_all()["jackknife_mean_order"].spark(spark, SF).toPandas()
    df = _orders_by_nation()
    s_tot, n_tot = df.v.sum(), len(df)
    grp = df.groupby("n_name")["v"].agg(["sum", "size"])
    theta = {nm: (s_tot - r["sum"]) / (n_tot - r["size"]) for nm, r in grp.iterrows()}
    loos = np.array([round(t, 9) for t in theta.values()])
    g = len(loos)
    se = np.sqrt((g - 1) / g * np.sum(np.round((loos - loos.mean()) ** 2, 9)))
    assert len(out) == g
    for _, r in out.iterrows():
        assert abs(r["theta_loo"] - theta[r["nation"]]) < 1e-5
    assert abs(out["theta_hat"].iloc[0] - s_tot / n_tot) < 1e-5
    assert abs(out["jackknife_se"].iloc[0] - se) < 1e-4


def test_capture_recapture_matches_pandas(spark):
    out = load_all()["capture_recapture_users"].spark(spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    c1 = set(ev.loc[ev.event_type == "click", "user_id"])
    c2 = set(ev.loc[ev.event_type == "view", "user_id"])
    m = len(c1 & c2)
    n_hat = (len(c1) + 1) * (len(c2) + 1) / (m + 1) - 1
    assert out["n_capture1"] == len(c1)
    assert out["n_capture2"] == len(c2)
    assert out["n_both"] == m
    assert abs(out["n_hat_chapman"] - n_hat) < 1e-6
    assert out["n_true_users"] == ev.user_id.nunique()
    # the estimator should land within a few SEs of truth when captures are
    # near-independent (behavioral captures are not perfectly so; allow 5 SE)
    assert abs(out["n_hat_chapman"] - out["n_true_users"]) < max(
        5 * out["se_seber"], 0.2 * out["n_true_users"]
    )
