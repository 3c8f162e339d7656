"""Kaplan-Meier survival (operators/survival.py).

Oracle parity runs in the driver gate; these pin the estimator against a
pure-python product-limit reference (lifelines/scipy are not in the
container) and the censoring semantics against hand-built cohorts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _km_reference(durs: np.ndarray, events: np.ndarray) -> pd.DataFrame:
    """Textbook product-limit estimator over (duration, event) pairs."""
    order = np.lexsort((events, durs))
    durs, events = durs[order], events[order]
    out = []
    s = 1.0
    for t in np.unique(durs):
        at = durs == t
        n_risk = int((durs >= t).sum())
        d = int(events[at].sum())
        c = int((~events[at].astype(bool)).sum())
        if d > 0:
            s *= 1.0 - d / n_risk
        out.append((int(t), d, c, n_risk, s))
    return pd.DataFrame(out, columns=["gap_days", "n_events", "n_censored", "n_risk", "survival"])


def _durations_from_orders(spark) -> tuple[np.ndarray, np.ndarray]:
    from serene_spark.catalog import load_table

    od = load_table(spark, SF, "orders").toPandas()
    od["day"] = (od["o_orderdate"].astype("int64") // 10**9) // 86400
    od = od.sort_values(["o_custkey", "day", "o_orderkey"])
    mx = int(od["day"].max())
    durs, events = [], []
    for _, grp in od.groupby("o_custkey"):
        days = grp["day"].to_numpy()
        for a, b in zip(days, days[1:]):
            durs.append(int(b - a))
            events.append(1)
        durs.append(mx - int(days[-1]))
        events.append(0)
    return np.array(durs), np.array(events)


def test_km_matches_product_limit_reference(spark):
    out = load_all()["km_order_gap"].spark(spark, SF).toPandas()
    durs, events = _durations_from_orders(spark)
    ref = _km_reference(durs, events)
    assert len(out) == len(ref)
    merged = out.merge(ref, on="gap_days", suffixes=("", "_ref"))
    assert (merged["n_events"] == merged["n_events_ref"]).all()
    assert (merged["n_censored"] == merged["n_censored_ref"]).all()
    assert (merged["n_risk"] == merged["n_risk_ref"]).all()
    # 12-dp log-term rounding + 6-dp output round vs float product
    assert (merged["survival"] - merged["survival_ref"]).abs().max() < 2e-6


def test_km_curve_shape(spark):
    out = load_all()["km_order_gap"].spark(spark, SF).toPandas()
    # survival is monotone non-increasing, starts <= 1, ends >= 0
    s = out.sort_values("gap_days")["survival"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()
    assert s[0] <= 1.0 and s[-1] >= 0.0
    # at-risk counts strictly decrease along the curve
    n = out.sort_values("gap_days")["n_risk"].to_numpy()
    assert (np.diff(n) < 0).all()
    # one duration per order: events + censored add up to the order count
    from serene_spark.catalog import load_table

    n_orders = load_table(spark, SF, "orders").count()
    assert int(out["n_events"].sum() + out["n_censored"].sum()) == n_orders


def test_km_censoring_matters(spark):
    """Dropping censored observations must bias the curve low (pessimistic):
    the censored-aware estimator dominates the events-only empirical CDF."""
    out = load_all()["km_order_gap"].spark(spark, SF).toPandas()
    durs, events = _durations_from_orders(spark)
    ev_only = durs[events == 1]
    # events-only "survival" = 1 - ECDF over observed gaps
    grid = out.sort_values("gap_days")
    ecdf_s = 1.0 - np.searchsorted(np.sort(ev_only), grid["gap_days"], side="right") / len(ev_only)
    # KM with censoring >= events-only curve pointwise (standard bias direction)
    assert (grid["survival"].to_numpy() - ecdf_s >= -1e-9).all()
    assert (grid["survival"].to_numpy() - ecdf_s).max() > 0.01  # and strictly so


def test_km_segment_partitions_cleanly(spark):
    seg = load_all()["km_order_gap_by_segment"].spark(spark, SF).toPandas()
    assert set(seg.columns) == {
        "mktsegment", "gap_days", "n_events", "n_censored", "n_risk", "survival"
    }
    # per-segment totals add up to the overall duration count
    overall = load_all()["km_order_gap"].spark(spark, SF).toPandas()
    assert int((seg["n_events"] + seg["n_censored"]).sum()) == int(
        (overall["n_events"] + overall["n_censored"]).sum()
    )
    # each segment curve is monotone
    for _, g in seg.groupby("mktsegment"):
        s = g.sort_values("gap_days")["survival"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()
