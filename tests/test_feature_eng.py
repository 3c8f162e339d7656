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
