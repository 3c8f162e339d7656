"""Feature engineering (operators/feature_eng.py): pandas/numpy pins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_target_encoding_matches_pandas(spark):
    out = load_all()["target_encode_event_type"].spark(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["v"] = np.round(ev.value.astype(float), 2)
    g = ev.v.mean()
    grp = ev.groupby("event_type")["v"].agg(["count", "sum", "mean"])
    for _, r in out.iterrows():
        e = grp.loc[r["event_type"]]
        assert r["n"] == e["count"]
        assert abs(r["mean_raw"] - e["mean"]) < 1e-5
        exp = (e["sum"] + 20 * g) / (e["count"] + 20)
        assert abs(r["enc_smoothed"] - exp) < 1e-5


def test_target_encoding_shrinks_toward_global_mean(spark):
    out = load_all()["target_encode_event_type"].spark(spark, SF).toPandas()
    g = out["global_mean"].iloc[0]
    for _, r in out.iterrows():
        raw_gap = abs(r["mean_raw"] - g)
        enc_gap = abs(r["enc_smoothed"] - g)
        assert enc_gap <= raw_gap + 1e-9  # shrinkage never overshoots


def test_woe_iv_matches_pandas(spark):
    out = load_all()["woe_iv_discount"].spark(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["disc"] = np.round(li.l_discount.astype(float), 2)
    li["bad"] = (li.l_returnflag == "R").astype(int)
    grp = li.groupby("disc").agg(bad=("bad", "sum"), n=("bad", "size"))
    grp["good"] = grp.n - grp.bad
    gt, bt = grp.good.sum(), grp.bad.sum()
    iv = 0.0
    for _, r in out.iterrows():
        e = grp.loc[round(r["discount"], 2)]
        assert (r["n_good"], r["n_bad"]) == (e["good"], e["bad"])
        if e["good"] and e["bad"]:
            woe = np.log((e["good"] / gt) / (e["bad"] / bt))
            assert abs(r["woe"] - woe) < 1e-5
            iv += round((e["good"] / gt - e["bad"] / bt) * woe, 12)
    assert abs(out["iv_total"].iloc[0] - iv) < 1e-5


def test_eb_shrinkage_properties_and_numpy(spark):
    out = load_all()["eb_shrunk_brand_means"].spark(spark, SF).toPandas()
    pt = pd.read_parquet(f"{SF}/part.parquet")
    pt["v"] = pt.p_retailprice.round(2)
    grp = pt.groupby("p_brand")["v"]
    grand = pt.v.mean()
    k, n = pt.p_brand.nunique(), len(pt)
    ssb_part = sum(g.sum() ** 2 / len(g) for _, g in grp)
    sigma2 = (np.sum(pt.v**2) - ssb_part) / (n - k)
    ssb = ssb_part - pt.v.sum() ** 2 / n
    n_sq = sum(len(g) ** 2 for _, g in grp)
    tau2 = max(0.0, (ssb - (k - 1) * sigma2) / (n - n_sq / n))
    assert len(out) == k
    for _, r in out.iterrows():
        g = grp.get_group(r["p_brand"])
        b = sigma2 / len(g) / (tau2 + sigma2 / len(g)) if tau2 > 0 else 1.0
        eb = grand + (1 - b) * (g.mean() - grand)
        assert abs(r["mean_raw"] - g.mean()) < 1e-4
        assert abs(r["shrink_b"] - b) < 1e-3
        assert abs(r["mean_eb"] - eb) < 1e-2
        # shrinkage never overshoots the grand mean
        lo, hi = sorted([g.mean(), grand])
        assert lo - 1e-6 <= r["mean_eb"] <= hi + 1e-6
