"""Tukey HSD, log-rank, AR(2) Yule-Walker, Holt-Winters
(operators/regression.py, survival.py, timeseries.py, forecast.py).

Oracle parity runs in the driver gate; these pin each statistic against
an independent numpy/pure-python computation on the raw parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- Tukey HSD


def test_tukey_matches_numpy(spark):
    out = load_all()["anova_tukey_pairs"].spark(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    v = np.round(ev["value"].astype(float), 2)
    groups = {t: v[ev.event_type == t].to_numpy() for t in ev.event_type.unique()}
    k = len(groups)
    n_tot = sum(len(g) for g in groups.values())
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups.values())
    msw = ssw / (n_tot - k)
    assert len(out) == k * (k - 1) // 2
    assert (out["df_within"] == n_tot - k).all()
    for _, r in out.iterrows():
        a, b = groups[r["type_a"]], groups[r["type_b"]]
        diff = a.mean() - b.mean()
        se = np.sqrt(msw / 2 * (1 / len(a) + 1 / len(b)))
        assert abs(r["mean_diff"] - diff) < 1e-4, r
        assert abs(r["se_q"] - se) < 1e-4
        assert abs(r["q_stat"] - diff / se) < 1e-3
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    # pairs are unordered and exhaustive
    assert (out["type_a"] < out["type_b"]).all()


# -------------------------------------------------------------- log-rank


def _logrank_reference():
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    df = orders.merge(
        cust[["c_custkey", "c_mktsegment"]],
        left_on="o_custkey", right_on="c_custkey",
    )
    df = df[df["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    df["day"] = (df["o_orderdate"].astype("int64") // 10**6 // 86400).astype(int)
    df = df.sort_values(["o_custkey", "day", "o_orderkey"])
    df["next_day"] = df.groupby("o_custkey")["day"].shift(-1)
    mx = df["day"].max()
    dur = np.where(df["next_day"].isna(), mx - df["day"], df["next_day"] - df["day"])
    ev = (~df["next_day"].isna()).astype(int)
    g1 = (df["c_mktsegment"] == "BUILDING").to_numpy()
    rows = pd.DataFrame({"dur": dur, "ev": ev, "g1": g1})
    o1 = e1 = v = 0.0
    for t in sorted(rows["dur"].unique()):
        at1 = ((rows["dur"] >= t) & rows["g1"]).sum()
        at2 = ((rows["dur"] >= t) & ~rows["g1"]).sum()
        d1 = ((rows["dur"] == t) & (rows["ev"] == 1) & rows["g1"]).sum()
        d2 = ((rows["dur"] == t) & (rows["ev"] == 1) & ~rows["g1"]).sum()
        d, n = d1 + d2, at1 + at2
        if d == 0:
            continue
        o1 += d1
        e1 += d * at1 / n
        if n > 1:
            v += d * at1 * at2 * (n - d) / (n**2 * (n - 1))
    return o1, e1, v, int(g1.sum()), int((~g1).sum())


def test_logrank_matches_reference(spark):
    out = load_all()["km_logrank_segments"].spark(spark, SF).toPandas().iloc[0]
    o1, e1, v, n1, n2 = _logrank_reference()
    assert out["observed_a"] == o1
    assert abs(out["expected_a"] - e1) < 1e-4
    assert (out["n_durations_a"], out["n_durations_b"]) == (n1, n2)
    assert abs(out["chi2"] - (o1 - e1) ** 2 / v) < 1e-3
    assert abs(out["z"] - (o1 - e1) / np.sqrt(v)) < 1e-3
    # observed totals conserve: every death is observed in one group
    assert abs(
        (out["observed_a"] + out["observed_b"])
        - (out["expected_a"] + out["expected_b"])
    ) < 1e-3


# ------------------------------------------------------------------ AR(2)


def _daily_orders_series():
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    day = (orders["o_orderdate"].astype("int64") // 10**6 // 86400).astype(int)
    rev = np.round(orders["o_totalprice"].astype(float), 2)
    per = pd.DataFrame({"day": day, "rev": rev}).groupby("day")["rev"].sum()
    spine = pd.Series(0.0, index=range(per.index.min(), per.index.max() + 1))
    spine.loc[per.index] = per
    return spine.to_numpy()


def test_ar2_matches_numpy(spark):
    out = load_all()["ar2_yule_walker"].spark(spark, SF).toPandas().iloc[0]
    x = _daily_orders_series()
    n = len(x)
    xb = x.mean()
    c0 = ((x - xb) ** 2).sum() / n
    c1 = ((x[:-1] - xb) * (x[1:] - xb)).sum() / n
    c2 = ((x[:-2] - xb) * (x[2:] - xb)).sum() / n
    r1, r2 = c1 / c0, c2 / c0
    phi1 = r1 * (1 - r2) / (1 - r1**2)
    phi2 = (r2 - r1**2) / (1 - r1**2)
    assert out["n_days"] == n
    assert abs(out["c0"] - c0) < max(1e-3, 1e-8 * c0)
    assert abs(out["r1"] - r1) < 1e-5
    assert abs(out["r2"] - r2) < 1e-5
    assert abs(out["phi1"] - phi1) < 1e-4
    assert abs(out["phi2"] - phi2) < 1e-4
    sigma2 = c0 * (1 - phi1 * r1 - phi2 * r2)
    assert abs(out["sigma2"] - sigma2) < max(1e-3, 1e-6 * abs(sigma2))
    assert out["stationary"] in (0, 1)
    want = int(phi1 + phi2 < 1 and phi2 - phi1 < 1 and abs(phi2) < 1)
    assert out["stationary"] == want


# ----------------------------------------------------------- Holt-Winters


def _daily_purchase_series():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[(ev.event_type == "purchase") & ev["value"].notna()]
    ts = ev["ts"].astype("int64")
    if ts.max() > 10**16:  # ns resolution
        day = (ts // 10**9 // 86400).astype(int)
    else:
        day = (ts // 10**6 // 86400).astype(int)
    rev = np.round(ev["value"].astype(float), 2)
    per = pd.DataFrame({"day": day, "rev": rev}).groupby("day")["rev"].sum()
    spine = pd.Series(0.0, index=range(per.index.min(), per.index.max() + 1))
    spine.loc[per.index] = per
    return spine


def _hw_reference(y, alpha, beta, gamma, m=7):
    """Textbook additive HW with the SQL's 9-dp per-step re-quantization."""
    w1 = y[:m].sum()
    w2 = y[m : 2 * m].sum()
    lvl = round(w1 / m, 9)
    trd = round((w2 - w1) / (m * m), 9)
    seas = [round(y[j] - w1 / m, 9) for j in range(m)]
    states = {m: (lvl, trd, list(seas))}
    for i in range(m, len(y)):  # 0-based y[i] is step i+1
        s1 = seas[0]
        nl = round(alpha * (y[i] - s1) + (1 - alpha) * (lvl + trd), 9)
        nb = round(beta * (nl - lvl) + (1 - beta) * trd, 9)
        ns = round(gamma * (y[i] - lvl - trd) + (1 - gamma) * s1, 9)
        seas = seas[1:] + [ns]
        lvl, trd = nl, nb
        states[i + 1] = (lvl, trd, list(seas))
    return states


def test_holt_winters_matches_python(spark):
    from serene_spark.operators.forecast import HW_ALPHA, HW_BETA, HW_GAMMA, HW_M

    out = (
        load_all()["holt_winters_daily"].spark(spark, SF).toPandas()
        .sort_values("day").reset_index(drop=True)
    )
    spine = _daily_purchase_series()
    y = spine.to_numpy()
    states = _hw_reference(
        y, float(HW_ALPHA), float(HW_BETA), float(HW_GAMMA), HW_M
    )
    fit = out[out["is_forecast"] == 0].reset_index(drop=True)
    assert len(fit) == len(y) - HW_M
    assert fit["day"].iloc[0] == spine.index[HW_M]
    for k, row in fit.iterrows():
        i = HW_M + 1 + k  # 1-based step index
        lvl, trd, seas = states[i]
        plvl, ptrd, pseas = states[i - 1]
        assert abs(row["level"] - round(lvl, 6)) < 2e-6, (i, row)
        assert abs(row["trend"] - round(trd, 6)) < 2e-6
        assert abs(row["forecast"] - round(plvl + ptrd + pseas[0], 6)) < 2e-6
        assert abs(row["revenue"] - round(y[i - 1], 6)) < 2e-6
    hor = out[out["is_forecast"] == 1].reset_index(drop=True)
    assert len(hor) == 7
    lvl, trd, seas = states[len(y)]
    for h in range(1, 8):
        row = hor.iloc[h - 1]
        assert row["day"] == spine.index[-1] + h
        assert abs(row["forecast"] - round(lvl + h * trd + seas[h - 1], 6)) < 2e-6
        assert pd.isna(row["revenue"])
