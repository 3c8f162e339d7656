"""Market-basket + conversion-lag operators (operators/basket.py)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_basket_lift_matches_python(spark):
    out = load_all()["basket_part_lift"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(lambda s: sorted(set(s)))
    n_orders = len(baskets)
    part_s: Counter = Counter()
    pair_s: Counter = Counter()
    for items in baskets:
        part_s.update(items)
        pair_s.update(combinations(items, 2))
    assert len(out) == sum(1 for c in pair_s.values() if c >= 3)
    for _, r in out.iterrows():
        a, b = r["part_a"], r["part_b"]
        s_ab = pair_s[(a, b)]
        assert r["n_orders_both"] == s_ab
        assert abs(r["support"] - round(s_ab / n_orders, 6)) < 1e-9
        assert abs(r["confidence_a_to_b"] - round(s_ab / part_s[a], 6)) < 1e-9
        lift = s_ab * n_orders / (part_s[a] * part_s[b])
        assert abs(r["lift"] - round(lift, 6)) < 1e-9


def test_conversion_lag_quantiles_match_pandas(spark):
    from serene_spark.catalog import load_table

    row = load_all()["conversion_lag_quantiles"].spark(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").toPandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    import math

    lags = []
    for _uid, grp in ev.groupby("user_id"):
        views = grp[grp.event_type == "view"]["ts_us"]
        if views.empty:
            continue
        fv = views.min()
        purch = grp[(grp.event_type == "purchase") & (grp.ts_us > fv)]["ts_us"]
        if not purch.empty:
            lags.append((purch.min() - fv) // 1_000_000)
    lags.sort()
    assert row["n_converted"] == len(lags)
    assert row["p50_lag_s"] == lags[math.ceil(0.5 * len(lags)) - 1]
    assert row["p90_lag_s"] == lags[math.ceil(0.9 * len(lags)) - 1]
