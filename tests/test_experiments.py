"""Experiment analysis + seasonality (operators/experiments.py)."""

from __future__ import annotations

import math

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_ab_test_is_calibrated_aa(spark):
    """The hash split carries no real treatment, so this is an A/A test:
    the z-statistic must not flag, arms must cover all exposed users, and
    the z formula must match an independent python computation."""
    row = load_all()["ab_test_conversion"].spark(spark, SF).collect()[0]
    na, ca = row["n_exposed_a"], row["n_converted_a"]
    nb, cb = row["n_exposed_b"], row["n_converted_b"]
    assert na > 0 and nb > 0
    assert 0 < ca < na and 0 < cb < nb  # non-degenerate rates
    p = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
    assert abs(row["z_score"] - round(z, 6)) < 1e-9
    assert row["significant_95"] == (1 if abs(z) >= 1.96 else 0)
    # A/A calibration: no effect exists, so the 95% test must not fire
    assert row["significant_95"] == 0, row


def test_seasonality_index_properties(spark):
    out = load_all()["events_seasonality"].spark(spark, SF).toPandas()
    assert set(out["clock_hour"]) == set(range(24))
    for et, grp in out.groupby("event_type"):
        assert len(grp) == 24
        # the index is mean-one-ish by construction: hour-weighted average
        # of seasonal_index equals 1 when every clock hour has equal
        # support; allow slack for unequal n_hours at month boundaries
        assert 0.8 < grp["seasonal_index"].mean() < 1.2
        assert (grp["seasonal_index"] > 0).all()


def test_seasonality_matches_pandas(spark):
    from serene_spark.catalog import load_table

    out = load_all()["events_seasonality"].spark(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["hour_bucket"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // (3600 * 1_000_000)
    )
    hourly = ev.groupby(["event_type", "hour_bucket"]).size().rename("cnt").reset_index()
    hourly["clock"] = hourly["hour_bucket"] % 24
    for _, r in out.iterrows():
        g = hourly[(hourly.event_type == r["event_type"]) & (hourly.clock == r["clock_hour"])]
        allg = hourly[hourly.event_type == r["event_type"]]
        mean_rate = g["cnt"].sum() / len(g)
        grand = allg["cnt"].sum() / len(allg)
        assert abs(r["mean_rate"] - round(mean_rate, 6)) < 1e-9
        assert abs(r["seasonal_index"] - round(mean_rate / grand, 6)) < 1e-9


def test_clv_cohort_curves_match_pandas(spark):
    from serene_spark.catalog import load_table

    out = load_all()["clv_cohort_curves"].spark(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    week = 7 * 24 * 3600 * 1_000_000
    signup = ev[ev.event_type == "signup"].groupby("user_id")["ts_us"].min()
    cohort = (signup // week).rename("cohort")
    sizes = cohort.value_counts()
    p = ev[ev.event_type == "purchase"].merge(signup.rename("s_us"), on="user_id")
    p = p[p.ts_us >= p.s_us]
    p["cohort"] = p["s_us"] // week
    p["age"] = (p.ts_us - p.s_us) // week
    p["v"] = p["value"].round(2)
    weekly = p.groupby(["cohort", "age"])["v"].sum()
    assert len(out) == len(weekly)
    for _, r in out.iterrows():
        c, a = r["cohort_week"], r["age_week"]
        assert r["cohort_users"] == sizes[c]
        assert abs(r["week_revenue"] - round(weekly[(c, a)], 6)) < 1e-6
        cohort_weeks = weekly.loc[c]
        cum = cohort_weeks[cohort_weeks.index <= a].sum()
        assert abs(r["cum_revenue_per_user"] - round(cum / sizes[c], 6)) < 1e-6
    # curves are non-decreasing in age per cohort
    for c, grp in out.groupby("cohort_week"):
        srt = grp.sort_values("age_week")["cum_revenue_per_user"]
        assert (srt.diff().dropna() >= -1e-9).all()


def test_dow_seasonality(spark, sf_dir):
    """Index definition and the dow mapping (epoch day 0 = Thursday)."""
    import datetime

    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    rows = load_all()["events_dow_seasonality"].spark(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(unix_timestamp(ts) / 86400 AS BIGINT) AS day"
    ).toPandas()
    ev["dow"] = (ev["day"] + 4) % 7
    for r in rows:
        sub = ev[ev["event_type"] == r["event_type"]]
        n = int((sub["dow"] == r["dow"]).sum())
        assert r["n_events"] == n
        n_dows = sub["dow"].nunique()
        assert abs(r["seasonal_index"] - round(n * n_dows / len(sub), 6)) < 1e-6
        # dow convention: (epoch_day + 4) % 7 with 0 = Sunday
        any_day = int(sub[sub["dow"] == r["dow"]]["day"].iloc[0])
        date = datetime.date(1970, 1, 1) + datetime.timedelta(days=any_day)
        assert (date.isoweekday() % 7) == r["dow"]
    # indices average to ~1 weighted by counts
    for etype in {r["event_type"] for r in rows}:
        sub = [r for r in rows if r["event_type"] == etype]
        total = sum(r["n_events"] for r in sub)
        w = sum(r["seasonal_index"] * r["n_events"] for r in sub) / total
        assert 0.9 < w < 1.2  # near 1 unless the week is wildly skewed


def test_rfm_segments_match_pandas(spark, sf_dir):
    import numpy as np

    from serene_spark.operators.experiments import RFM_BINS
    from serene_spark.registry import load_all

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_custkey",
        "CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) / 86400 AS BIGINT) AS day",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price",
    ).toPandas()
    anchor = orders["day"].max()
    per = orders.groupby("o_custkey").agg(
        last=("day", "max"), frequency=("day", "size"), monetary=("price", "sum")
    )
    per["recency_days"] = anchor - per["last"]

    def bounds(vals):
        v = np.sort(np.unique(vals))
        cum = np.array([int((vals <= x).sum()) for x in v])
        n = len(vals)
        return [
            v[np.argmax(cum >= np.ceil(q * n / RFM_BINS))]
            for q in range(1, RFM_BINS)
        ]

    rb = bounds(per["recency_days"].values)
    fb = bounds(per["frequency"].values)
    mb = bounds(per["monetary"].values.astype(float))

    def score(v, bs):
        return sum(1 for b in bs if v > b) + 1

    rows = {r["o_custkey"]: r
            for r in load_all()["rfm_segments"].spark(spark, sf_dir).collect()}
    assert set(rows) == set(per.index)
    for ck, p in per.iterrows():
        r = rows[ck]
        assert r["recency_days"] == p["recency_days"]
        assert r["frequency"] == p["frequency"]
        assert abs(r["monetary"] - float(p["monetary"])) < 0.01
        assert r["r_score"] == RFM_BINS + 1 - score(p["recency_days"], rb)
        assert r["f_score"] == score(p["frequency"], fb)
        assert r["m_score"] == score(float(p["monetary"]), mb)
    # scores span the full range on a corpus this size
    assert {r["m_score"] for r in rows.values()} == set(range(1, RFM_BINS + 1))


def test_revenue_mom(spark, sf_dir):
    from serene_spark.registry import load_all

    rows = sorted(
        load_all()["revenue_mom"].spark(spark, sf_dir).collect(),
        key=lambda r: r["month_key"],
    )
    assert rows
    assert rows[0]["mom_delta"] is None and rows[0]["mom_pct"] is None
    for prev, cur in zip(rows, rows[1:]):
        if cur["month_key"] == prev["month_key"] + 1:
            assert abs(cur["mom_delta"] - (cur["revenue"] - prev["revenue"])) < 0.01
            assert abs(cur["mom_pct"]
                       - round((cur["revenue"] - prev["revenue"])
                               / prev["revenue"] * 100, 6)) < 1e-4
    total = sum(r["revenue"] for r in rows)
    expected = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s"
    ).collect()[0]["s"]
    assert abs(total - expected) < 0.01


def test_boxplot_matches_pandas(spark):
    """Boxplot stats recomputed independently: ceil-rank quartiles, Tukey
    fences, whiskers, outlier counts."""
    import math

    import numpy as np

    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["boxplot_orders_by_segment"].spark(spark, sf).toPandas()
    od = load_table(spark, sf, "orders").toPandas()
    cu = load_table(spark, sf, "customer").toPandas()
    df = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    df["v"] = df["o_totalprice"].round(2)

    assert len(out) == df["c_mktsegment"].nunique()
    for _, r in out.iterrows():
        vals = np.sort(df[df["c_mktsegment"] == r["mktsegment"]]["v"].to_numpy())
        n = len(vals)
        assert r["n"] == n

        def q_at(q):  # value at the smallest cumulative count >= ceil(q*n/4)
            return vals[math.ceil(q * n / 4) - 1]

        assert abs(r["q1"] - q_at(1)) < 1e-9
        assert abs(r["median"] - q_at(2)) < 1e-9
        assert abs(r["q3"] - q_at(3)) < 1e-9
        assert abs(r["min_x"] - vals[0]) < 1e-9
        assert abs(r["max_x"] - vals[-1]) < 1e-9
        iqr = q_at(3) - q_at(1)
        lo_f, hi_f = q_at(1) - 1.5 * iqr, q_at(3) + 1.5 * iqr
        inside = vals[(vals >= lo_f) & (vals <= hi_f)]
        assert abs(r["lo_whisker"] - inside.min()) < 1e-9
        assert abs(r["hi_whisker"] - inside.max()) < 1e-9
        assert r["n_outliers"] == int(((vals < lo_f) | (vals > hi_f)).sum())
        # structural sanity
        assert r["min_x"] <= r["lo_whisker"] <= r["q1"] <= r["median"] \
            <= r["q3"] <= r["hi_whisker"] <= r["max_x"]


def test_ab_power_matches_numpy(spark):
    """Fleiss two-proportion required-n recomputed in python; grid
    monotonicity (bigger MDE -> smaller n); consistency with the A/B
    test's own arm counts."""
    import math

    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["ab_power_analysis"].spark(spark, sf).toPandas()
    ab = load_all()["ab_test_conversion"].spark(spark, sf).collect()[0]
    p1 = ab["n_converted_a"] / ab["n_exposed_a"]
    n_cur = min(ab["n_exposed_a"], ab["n_exposed_b"])
    za, zb = 1.959964, 0.841621
    assert sorted(out["mde_pct"]) == [2, 5, 10, 20]
    for _, r in out.iterrows():
        p2 = p1 * (1 + r["mde_pct"] / 100.0)
        pbar = (p1 + p2) / 2
        n_req = math.ceil(
            (za * math.sqrt(2 * pbar * (1 - pbar))
             + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / (p2 - p1) ** 2
        )
        assert r["n_required_per_arm"] == n_req
        assert r["n_current_min_arm"] == n_cur
        assert r["adequately_powered"] == int(n_cur >= n_req)
        assert abs(r["baseline_rate"] - round(p1, 6)) < 1e-9
    ns = out.sort_values("mde_pct")["n_required_per_arm"].to_numpy()
    assert (ns[:-1] > ns[1:]).all()  # finer effects need more users


def test_new_vs_returning_conservation(spark):
    """sum(new) = distinct users; new + returning = actives; day one is
    all-new; pandas recheck per day."""
    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = (
        load_all()["users_new_vs_returning"].spark(spark, sf).toPandas()
        .sort_values("day_bucket").reset_index(drop=True)
    )
    ev = load_table(spark, sf, "events").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 10**9) // 86400
    assert int(out["new_users"].sum()) == ev["user_id"].nunique()
    assert (out["new_users"] + out["returning_users"] == out["active_users"]).all()
    assert out.loc[0, "returning_users"] == 0  # nobody can return on day one
    firsts = ev.groupby("user_id")["day"].min()
    for _, r in out.iterrows():
        day_users = set(ev[ev["day"] == r["day_bucket"]]["user_id"])
        exp_new = sum(1 for u in day_users if firsts[u] == r["day_bucket"])
        assert r["active_users"] == len(day_users)
        assert r["new_users"] == exp_new
