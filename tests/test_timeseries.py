"""Time-series gap fill + OHLC (operators/timeseries.py).

Oracle parity runs in the driver gate; these pin the semantics against an
independent pandas implementation and the scale shape of the plan.
"""

from __future__ import annotations

import re

import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    df = None
    from serene_spark.catalog import load_table

    df = load_table(spark, SF, "events").toPandas()
    df["hour_bucket"] = (
        df["ts"].astype("datetime64[us]").astype("int64") // (3600 * 1_000_000)
    )
    return df


def test_gapfill_matches_pandas_ffill(spark):
    out = load_all()["ts_gapfill_locf"].spark(spark, SF).toPandas()
    ev = _events_pdf(spark)

    # independent reference: pandas resample+ffill per user
    ev = ev.sort_values(["ts", "event_id"])  # arg_max by (ts, event_id)
    hourly = ev.groupby(["user_id", "hour_bucket"]).agg(
        v_last=("value", "last"), n=("value", "size")
    )
    for uid in list(ev["user_id"].unique())[:10]:
        h = hourly.loc[uid]
        full = range(int(h.index.min()), int(h.index.max()) + 1)
        ref = h.reindex(full)
        ref["v_locf"] = ref["v_last"].ffill()
        got = out[out.user_id == uid].set_index("hour_bucket").sort_index()
        assert list(got.index) == list(full)  # exact per-user span, no more
        assert (got["observed"] == (~ref["n"].isna()).astype(int).values).all()
        assert (
            (got["value_locf"] - ref["v_locf"].round(6)).abs() < 1e-9
        ).all()


def test_gapfill_grid_is_span_bounded(spark):
    """No user gets rows outside [first hour, last hour] — the grid is
    per-user spans, not users x calendar."""
    out = load_all()["ts_gapfill_locf"].spark(spark, SF).toPandas()
    spans = out[out.observed == 1].groupby("user_id")["hour_bucket"].agg(["min", "max"])
    all_spans = out.groupby("user_id")["hour_bucket"].agg(["min", "max", "count"])
    assert (all_spans["min"] == spans["min"]).all()
    assert (all_spans["max"] == spans["max"]).all()
    assert (all_spans["count"] == all_spans["max"] - all_spans["min"] + 1).all()


def test_ohlc_matches_pandas(spark):
    out = load_all()["ts_ohlc_daily"].spark(spark, SF).toPandas()
    ev = _events_pdf(spark)
    ev["day_bucket"] = ev["hour_bucket"] // 24
    ev = ev.sort_values(["ts", "event_id"])
    ref = ev.groupby(["event_type", "day_bucket"])["value"].agg(
        open_value="first", high_value="max", low_value="min",
        close_value="last", n_events="size",
    ).reset_index()
    merged = out.merge(ref, on=["event_type", "day_bucket"], suffixes=("", "_ref"))
    assert len(merged) == len(out) == len(ref)
    for c in ("open_value", "high_value", "low_value", "close_value"):
        assert ((merged[c] - merged[f"{c}_ref"].round(6)).abs() < 1e-9).all()
    assert (merged["n_events"] == merged["n_events_ref"]).all()


def test_plans_single_event_scan(spark):
    for name in ("ts_gapfill_locf", "ts_ohlc_daily"):
        q = load_all()[name]
        plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
        scans = len(re.findall(r"FileScan parquet[^\n]*events\.parquet", plan))
        assert scans == 1, (name, plan)


def test_acf_matches_numpy(spark):
    """Box-Jenkins constant-denominator ACF recomputed with numpy over the
    same zero-filled calendar spine."""
    import numpy as np

    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = (
        load_all()["ts_acf_daily"].spark(spark, sf).toPandas()
        .sort_values("lag").reset_index(drop=True)
    )
    cus = load_all()["cusum_daily_revenue"].spark(spark, sf).toPandas()
    x = cus.sort_values("epoch_day")["revenue"].to_numpy()  # spine incl. zeros
    xc = x - x.mean()
    denom = (xc**2).sum()
    for _, r in out.iterrows():
        k = int(r["lag"])
        ref = (xc[:-k] * xc[k:]).sum() / denom
        assert abs(r["acf"] - round(ref, 6)) < 2e-6, (k, r["acf"], ref)
        assert r["n_pairs"] == len(x) - k
        assert abs(r["wn_band"] - round(1.96 / np.sqrt(len(x)), 6)) < 1e-9
        assert r["significant"] == int(abs(ref) > 1.96 / np.sqrt(len(x)))
    # a weekly-periodic series must show its period in the ACF
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.timeseries import ts_acf_sql

    base = datetime.datetime(2020, 1, 1)
    rows = [
        (i + 1, base + datetime.timedelta(days=i),
         1000.0 + (500.0 if i % 7 == 0 else 0.0))
        for i in range(280)
    ]
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    per = spark.sql(ts_acf_sql(SPARK_D)).toPandas().set_index("lag")
    spark.catalog.dropTempView("orders")
    for k in (7, 14, 21, 28):
        assert per.loc[k, "acf"] > 0.8 and per.loc[k, "significant"] == 1
    for k in (3, 10, 17):
        assert per.loc[k, "acf"] < 0.1


def test_decompose_matches_numpy(spark):
    """Centered MA(12) trend, mean-centered seasonal index, residual —
    recomputed with numpy convolution over the same monthly series."""
    import numpy as np

    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = (
        load_all()["ts_decompose_monthly"].spark(spark, sf).toPandas()
        .sort_values("month_key").reset_index(drop=True)
    )
    y = out["revenue"].to_numpy()
    n = len(y)
    w = np.r_[0.5, np.ones(11), 0.5] / 12
    trend = np.full(n, np.nan)
    for i in range(6, n - 6):
        trend[i] = round((w * np.round(y[i - 6 : i + 7], 6)).sum(), 6)
    got_t = out["trend"].to_numpy()
    assert np.isnan(got_t[:6]).all() and np.isnan(got_t[-6:]).all()
    assert np.nanmax(np.abs(got_t - trend)) < 2e-5
    dt = y - trend
    mons = out["mon"].to_numpy()
    raw = {m: np.nanmean(np.round(dt[mons == m], 6)) for m in range(1, 13)}
    grand = np.mean([raw[m] for m in range(1, 13)])
    for m in range(1, 13):
        s_ref = raw[m] - grand
        got = out[out["mon"] == m]["seasonal"].iloc[0]
        assert abs(got - s_ref) < 2e-4, (m, got, s_ref)
    # identity: residual = y - trend - seasonal wherever trend exists
    res = out["residual"].to_numpy()
    s = out["seasonal"].to_numpy()
    mask = ~np.isnan(got_t)
    assert np.abs(res[mask] - (y[mask] - got_t[mask] - s[mask])).max() < 2e-5


def test_mann_kendall_matches_numpy(spark):
    """S, tie-corrected variance, continuity-corrected z, and the Sen
    slope recomputed from first principles over the same spine."""
    import numpy as np

    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    [r] = load_all()["trend_mann_kendall"].spark(spark, sf).collect()
    cus = load_all()["cusum_daily_revenue"].spark(spark, sf).toPandas()
    x = cus.sort_values("epoch_day")["revenue"].to_numpy()
    n = len(x)
    assert r["n_days"] == n
    diff = np.sign(x[None, :] - x[:, None])
    s = int(np.triu(diff, 1).sum())
    assert r["mk_s"] == s
    _, t = np.unique(x, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()) / 18
    assert abs(r["var_s"] - round(var, 6)) < 1e-6
    z = (s - 1) / np.sqrt(var) if s > 0 else (s + 1) / np.sqrt(var) if s < 0 else 0.0
    assert abs(r["z"] - round(z, 6)) < 2e-6
    assert r["trend_detected"] == int(abs(z) > 1.96)
    # Sen slope: lower-middle of the sorted pairwise slopes (cc >= ceil/2)
    idx = np.triu_indices(n, 1)
    slopes = np.round((x[idx[1]] - x[idx[0]]) / (idx[1] - idx[0]), 9)
    sv = np.sort(slopes)
    sen = sv[int(np.ceil(len(sv) / 2)) - 1]
    assert abs(r["sen_slope_per_day"] - sen) < 1e-9


def test_mann_kendall_detects_injected_trend(spark):
    """A clean upward drift must flag with a positive z and recover its
    slope; a flat noisy series must not flag."""
    import datetime

    import numpy as np
    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.timeseries import trend_mk_sql

    rng = np.random.default_rng(13)
    base = datetime.datetime(2020, 1, 1)

    def run(vals):
        rows = [
            (i + 1, base + datetime.timedelta(days=i), float(v))
            for i, v in enumerate(vals)
        ]
        df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
        spark.createDataFrame(df).createOrReplaceTempView("orders")
        [got] = spark.sql(trend_mk_sql(SPARK_D)).collect()
        spark.catalog.dropTempView("orders")
        return got

    up = run(np.round(1000 + 2.0 * np.arange(300) + rng.normal(0, 20, 300), 2))
    flat = run(np.round(1000 + rng.normal(0, 20, 300), 2))
    assert up["trend_detected"] == 1 and up["z"] > 10
    assert abs(up["sen_slope_per_day"] - 2.0) < 0.2
    assert flat["trend_detected"] == 0


def test_decompose_spine_fills_gap_months(spark):
    """The centered MA(12) must see a gap month as a zero row, never
    splice non-adjacent months into one window (review-pass fix)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.timeseries import ts_decompose_sql

    rows = []
    k = 0
    for i in range(30):
        if i == 15:
            continue  # gap month
        d = datetime.datetime(2020 + i // 12, i % 12 + 1, 10)
        rows.append((k := k + 1, d, 1200.0))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    out = (
        spark.sql(ts_decompose_sql(SPARK_D)).toPandas()
        .sort_values("month_key").reset_index(drop=True)
    )
    spark.catalog.dropTempView("orders")
    assert len(out) == 30  # calendar span, gap included
    assert (out["month_key"].diff().dropna() == 1).all()
    gap = out.iloc[15]
    assert gap["revenue"] == 0.0
    # the zero month genuinely enters its neighbors' centered averages:
    # months within 6 of the gap carry a trend depressed by ~1200/12
    near = out.iloc[12]["trend"]
    far = out.iloc[7]["trend"]
    assert abs(far - 1200.0) < 1e-6
    assert abs(near - (1200.0 - 1200.0 / 12)) < 1e-6


def test_acf_constant_series_yields_null(spark):
    """A constant series has no autocorrelation: denom = 0 must emit NULL
    acf (ANSI Spark would raise on the 0/0; second-review fix)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.timeseries import ts_acf_sql

    rows = [
        (i + 1, datetime.datetime(2020, 1, 1) + datetime.timedelta(days=i), 500.0)
        for i in range(90)
    ]
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    out = spark.sql(ts_acf_sql(SPARK_D)).toPandas()
    spark.catalog.dropTempView("orders")
    assert len(out) == 30
    assert out["acf"].isna().all()
    assert out["significant"].isna().all()


def test_ccf_matches_numpy(spark):
    import numpy as np

    from serene_spark.registry import load_all

    out = load_all()["ccf_view_purchase"].spark(spark, "/root/testdata/sf0.001").toPandas()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").toPandas()
    ev = ev[ev.event_type.isin(["view", "purchase"])]
    ev["hr"] = ev["ts"].astype("datetime64[us]").astype("int64") // (3600 * 1_000_000)
    h0, h1 = ev.hr.min(), ev.hr.max()
    idx = {h: i for i, h in enumerate(range(h0, h1 + 1))}
    x = np.zeros(len(idx)); y = np.zeros(len(idx))
    for h, grp in ev.groupby("hr"):
        x[idx[h]] = (grp.event_type == "view").sum()
        y[idx[h]] = (grp.event_type == "purchase").sum()
    xb, yb = x.mean(), y.mean()
    dx = ((x - xb) ** 2).sum(); dy = ((y - yb) ** 2).sum()
    want = {}
    for k in range(25):
        num = ((x[: len(x) - k] - xb) * (y[k:] - yb)).sum()
        want[k] = round(num / np.sqrt(dx * dy), 6)
    got = dict(zip(out.lag_hours, out.ccf))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, k
    # exactly one peak flag, at the argmax lag
    peaks = out[out.is_peak == 1]
    assert len(peaks) == 1
    assert peaks.iloc[0].lag_hours == max(want, key=want.get)
    # n_pairs shrinks by exactly one per unit lag (series length - k)
    n0 = out[out.lag_hours == 0].iloc[0].n_pairs
    assert all(r.n_pairs == n0 - r.lag_hours for r in out.itertuples())
