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
