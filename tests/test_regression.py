"""Regression & parametric inference family (operators/regression.py).

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin every
statistic against an independent full-precision numpy computation on the
raw parquet, plus structural invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _events():
    df = pd.read_parquet(f"{SF}/events.parquet")
    df = df[df["value"].notna()].copy()
    df["v"] = np.round(df["value"].astype(float), 2)
    return df


def test_ttest_welch_matches_numpy(spark):
    out = load_all()["ttest_welch_value"].spark(spark, SF).toPandas()
    ev = _events()
    a = ev.loc[ev.event_type == "click", "v"].to_numpy()
    b = ev.loc[ev.event_type == "purchase", "v"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df_w = se2**2 / (
        va**2 / (len(a) ** 2 * (len(a) - 1)) + vb**2 / (len(b) ** 2 * (len(b) - 1))
    )
    r = out.iloc[0]
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert abs(r["mean_a"] - a.mean()) < 1e-4
    assert abs(r["var_b"] - vb) < 1e-3
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["df_welch"] - df_w) < 0.01


def test_anova_matches_numpy(spark):
    out = load_all()["anova_value_by_type"].spark(spark, SF).toPandas()
    ev = _events()
    groups = [g["v"].to_numpy() for _, g in ev.groupby("event_type")]
    grand = ev["v"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(ev)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert len(out) == k
    assert out["f_stat"].nunique() == 1
    assert abs(out["f_stat"].iloc[0] - f) < 1e-3
    assert abs(out["eta_sq"].iloc[0] - ssb / (ssb + ssw)) < 1e-5
    assert (out["df_between"] == k - 1).all()
    assert (out["df_within"] == n - k).all()
    mean_map = {t: g["v"].mean() for t, g in ev.groupby("event_type")}
    for _, row in out.iterrows():
        assert abs(row["mean_value"] - mean_map[row["event_type"]]) < 1e-4


def test_ols_matches_numpy(spark):
    out = (
        load_all()["ols_revenue_drivers"]
        .spark(spark, SF)
        .toPandas()
        .set_index("term")
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    x1 = np.round(li["l_quantity"].astype(float), 2)
    x2 = np.round(li["l_discount"].astype(float), 2)
    y = np.round(
        np.round(li["l_extendedprice"].astype(float), 2) * (1 - x2), 2
    )
    X = np.column_stack([np.ones(len(y)), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sigma2 = (resid**2).sum() / (len(y) - 3)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    for j, term in enumerate(["intercept", "l_quantity", "l_discount"]):
        row = out.loc[term]
        assert abs(row["coefficient"] - beta[j]) < max(1e-4, 1e-6 * abs(beta[j]))
        assert abs(row["std_err"] - np.sqrt(cov[j, j])) < max(
            1e-4, 1e-5 * np.sqrt(cov[j, j])
        )
        assert abs(row["t_stat"] - beta[j] / np.sqrt(cov[j, j])) < 1e-3
    assert abs(out["r2"].iloc[0] - r2) < 1e-5
    assert (out["n"] == len(y)).all()


def _sessions():
    """Engine-convention sessionization (30-min gap, (ts, event_id) order)
    walked imperatively."""
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    rows = []
    for uid, grp in ev.groupby("user_id"):
        ts_us = grp["ts"].astype("int64").to_numpy()
        # parquet may be ns or us resolution; normalize to us
        if ts_us.max() > 10**16:
            ts_us = ts_us // 1000
        sid = np.concatenate([[0], (np.diff(ts_us) > 30 * 60 * 1_000_000).cumsum()])
        g = grp.assign(sid=sid)
        for s, sg in g.groupby("sid"):
            rows.append(
                {
                    "y": float((sg.event_type == "purchase").any()),
                    "x1": round(np.log1p((sg.event_type == "click").sum()), 9),
                    "x2": round(np.log1p((sg.event_type == "view").sum()), 9),
                }
            )
    return pd.DataFrame(rows)


def test_logit_matches_numpy_irls(spark):
    out = (
        load_all()["logit_session_conversion"]
        .spark(spark, SF)
        .toPandas()
        .set_index("term")
    )
    s = _sessions()
    X = np.column_stack([np.ones(len(s)), s["x1"], s["x2"]])
    y = s["y"].to_numpy()
    beta = np.zeros(3)
    for _ in range(50):
        p = 1 / (1 + np.exp(-(X @ beta)))
        w = np.maximum(p * (1 - p), 1e-12)
        delta = np.linalg.solve(X.T @ (X * w[:, None]), X.T @ (y - p))
        beta += delta
        if np.abs(delta).max() < 1e-12:
            break
    assert out.loc["intercept", "n_sessions"] == len(s)
    for j, term in enumerate(["intercept", "log1p_clicks", "log1p_views"]):
        # 10 quantized Newton steps vs the full-precision fixed point
        assert abs(out.loc[term, "coefficient"] - beta[j]) < 1e-3, (term, beta[j])
    p = 1 / (1 + np.exp(-(X @ beta)))
    ll = (y * np.log(p) + (1 - y) * np.log(1 - p)).sum()
    pbar = y.mean()
    ll0 = len(y) * (pbar * np.log(pbar) + (1 - pbar) * np.log(1 - pbar))
    assert abs(out["log_lik"].iloc[0] - ll) < 0.05
    assert abs(out["mcfadden_r2"].iloc[0] - (1 - ll / ll0)) < 1e-4
    assert ((p >= 0.5) == (y > 0.5)).mean() - 1e-9 <= out["accuracy"].iloc[0] <= 1


def test_logit_fit_quality(spark):
    out = load_all()["logit_session_conversion"].spark(spark, SF).toPandas()
    assert 0 <= out["mcfadden_r2"].iloc[0] < 1
    assert 0.5 <= out["accuracy"].iloc[0] <= 1
    assert out["log_lik"].iloc[0] < 0


def test_poisson_matches_numpy_irls(spark):
    out = (
        load_all()["poisson_hourly_glm"]
        .spark(spark, SF)
        .toPandas()
        .set_index("term")
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.event_type == "purchase"]
    ts = ev["ts"].astype("int64")
    hr = (ts // 10**9 // 3600 if ts.max() > 10**16 else ts // 10**6 // 3600)
    per = hr.value_counts().sort_index()
    spine = pd.Series(0, index=range(per.index.min(), per.index.max() + 1))
    spine.loc[per.index] = per
    y = spine.to_numpy().astype(float)
    hod = np.array(spine.index) % 24
    x1 = np.round(np.sin(2 * np.pi * hod / 24), 9)
    x2 = np.round(np.cos(2 * np.pi * hod / 24), 9)
    X = np.column_stack([np.ones(len(y)), x1, x2])
    beta = np.array([np.log(y.mean()), 0.0, 0.0])
    for _ in range(50):
        lam = np.exp(X @ beta)
        delta = np.linalg.solve(X.T @ (X * lam[:, None]), X.T @ (y - lam))
        beta += delta
        if np.abs(delta).max() < 1e-12:
            break
    assert out.loc["intercept", "n_hours"] == len(y)
    for j, term in enumerate(["intercept", "sin_hour", "cos_hour"]):
        assert abs(out.loc[term, "coefficient"] - beta[j]) < 1e-3, (term, beta[j])
    lam = np.exp(X @ beta)
    dev = 2 * np.sum(np.where(y > 0, y * np.log(y / lam), 0) - (y - lam))
    assert abs(out["deviance"].iloc[0] - dev) < 0.01
    assert abs(out["dispersion"].iloc[0] - dev / (len(y) - 3)) < 1e-4
    amp = np.hypot(beta[1], beta[2])
    assert abs(out["amplitude"].iloc[0] - amp) < 1e-3
    peak = (24 / (2 * np.pi)) * np.arctan2(beta[1], beta[2]) % 24
    assert abs(out["peak_hour"].iloc[0] - peak) < 0.05 or amp < 1e-3
