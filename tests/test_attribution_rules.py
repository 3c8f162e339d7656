"""Rule-based attribution (operators/attribution_rules.py): pandas pins.

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin the
credit models against an independent pandas implementation and the
conservation law both models must satisfy (total credit = number of
converting users with at least one pre-conversion touch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _touches():
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    fp = (
        ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min().rename("fp_ts")
    )
    t = ev.merge(fp, on="user_id")
    t = t[(t.ts < t.fp_ts) & (t.event_type != "purchase")]
    return t.sort_values(["user_id", "ts", "event_id"])


def _position_ref(t: pd.DataFrame) -> pd.Series:
    out = {}
    for _, g in t.groupby("user_id"):
        k = len(g)
        for i, ch in enumerate(g.event_type, start=1):
            if k == 1:
                c = 1.0
            elif k == 2:
                c = 0.5
            elif i in (1, k):
                c = 0.4
            else:
                c = 0.2 / (k - 2)
            out[ch] = out.get(ch, 0.0) + round(c, 12)
    return pd.Series(out)


def _decay_ref(t: pd.DataFrame) -> pd.Series:
    half_us = 7.0 * 86400 * 1e6
    out = {}
    for _, g in t.groupby("user_id"):
        dt = (g.fp_ts - g.ts).dt.total_seconds().to_numpy() * 1e6
        w = np.power(2.0, -dt / half_us)
        w = w / w.sum()
        for ch, c in zip(g.event_type, w):
            out[ch] = out.get(ch, 0.0) + round(c, 12)
    return pd.Series(out)


def test_position_u_matches_pandas(spark):
    out = load_all()["attribution_position_u"].spark(spark, SF).toPandas()
    ref = _position_ref(_touches())
    assert set(out.channel) == set(ref.index)
    for _, r in out.iterrows():
        assert abs(r["credit"] - ref[r["channel"]]) < 1e-6


def test_time_decay_matches_pandas(spark):
    out = load_all()["attribution_time_decay"].spark(spark, SF).toPandas()
    ref = _decay_ref(_touches())
    for _, r in out.iterrows():
        assert abs(r["credit"] - ref[r["channel"]]) < 1e-6


def test_both_models_conserve_total_credit(spark):
    t = _touches()
    n_conv = t.user_id.nunique()
    for name in ("attribution_position_u", "attribution_time_decay"):
        out = load_all()[name].spark(spark, SF).toPandas()
        assert abs(out["credit"].sum() - n_conv) < 1e-4, name


def test_shapley_matches_python_game(spark):
    from itertools import combinations
    from math import factorial

    out = load_all()["attribution_shapley"].spark(spark, SF).toPandas()
    t = _touches()
    bits = {"click": 1, "view": 2, "error": 4, "signup": 8}
    masks = t.groupby("user_id")["event_type"].apply(
        lambda s: sum({bits[x] for x in s})
    )
    from collections import Counter
    hist = Counter(masks)

    def v(S):
        return sum(c for m, c in hist.items() if (m & S) == m)

    n = 4
    for _, r in out.iterrows():
        b = bits[r["channel"]]
        phi = 0.0
        for S in range(16):
            if S & b:
                continue
            k = bin(S).count("1")
            w = factorial(k) * factorial(n - 1 - k) / factorial(n)
            phi += round(w * (v(S | b) - v(S)), 12)
        assert abs(r["shapley_conversions"] - phi) < 1e-5
    assert abs(out["efficiency_residual"].iloc[0]) < 1e-5
    assert abs(out["shapley_conversions"].sum()
               - out["total_conversions"].iloc[0]) < 1e-4
