"""Holt linear-trend forecast (operators/forecast.py).

Oracle parity runs in the driver gate; these pin the recurrence against
a pure-python Holt implementation (statsmodels is not in the container)
and the horizon/flag semantics.
"""

from __future__ import annotations

import numpy as np

from serene_spark.operators.forecast import ALPHA, BETA, HORIZON
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"

_CACHE: dict[str, object] = {}


def _run_once(spark):
    """The recursion walks ~80 sequential levels (~40 s); run it once for
    both assertion groups."""
    if "out" not in _CACHE:
        _CACHE["out"] = (
            load_all()["holt_forecast_monthly"].spark(spark, SF).toPandas()
            .sort_values("month_key").reset_index(drop=True)
        )
    return _CACHE["out"]


def _holt_reference(y: np.ndarray, alpha: float, beta: float):
    """Textbook Holt with the SQL's 9-dp per-step re-quantization."""
    lvl = [y[0]]
    trd = [round(float(y[1] - y[0]), 9)]
    for i in range(1, len(y)):
        nl = round(alpha * y[i] + (1 - alpha) * (lvl[-1] + trd[-1]), 9)
        nt = round(beta * (nl - lvl[-1]) + (1 - beta) * trd[-1], 9)
        lvl.append(nl)
        trd.append(nt)
    return np.array(lvl), np.array(trd)


def test_holt_matches_python(spark):
    out = _run_once(spark)
    fit = out[out["is_forecast"] == 0].reset_index(drop=True)
    y = fit["revenue"].to_numpy()
    lvl, trd = _holt_reference(y, float(ALPHA), float(BETA))
    assert np.abs(fit["level"].to_numpy() - np.round(lvl, 6)).max() < 2e-6
    assert np.abs(fit["trend"].to_numpy() - np.round(trd, 6)).max() < 2e-6
    # one-step in-sample forecast = previous level + previous trend
    fc = lvl[:-1] + trd[:-1]
    got = fit["forecast"].to_numpy()
    assert np.isnan(got[0])  # no prior state for the first month
    assert np.abs(got[1:] - np.round(fc, 6)).max() < 2e-6
    # errors are actual minus forecast
    err = fit["err"].to_numpy()
    assert np.abs(err[1:] - np.round(y[1:] - np.round(fc, 6), 6)).max() < 2e-6


def test_holt_horizon_semantics(spark):
    out = _run_once(spark)
    fit = out[out["is_forecast"] == 0]
    hor = out[out["is_forecast"] == 1].reset_index(drop=True)
    assert len(hor) == HORIZON
    # horizon months continue the calendar without gaps
    last = int(fit["month_key"].max())
    assert hor["month_key"].tolist() == [last + h for h in range(1, HORIZON + 1)]
    # linear extrapolation from the final state; no fake actuals
    l_n = fit["level"].iloc[-1]
    b_n = fit["trend"].iloc[-1]
    for h in range(1, HORIZON + 1):
        assert abs(hor["forecast"].iloc[h - 1] - round(l_n + h * b_n, 6)) < 2e-6
    assert hor["revenue"].isna().all()
    assert hor["err"].isna().all()
    # month_key -> (yr, mon) decode is consistent everywhere
    assert (out["month_key"] == out["yr"] * 12 + out["mon"] - 1).all()


def test_holt_tracks_injected_trend(spark):
    """On a clean linear series the smoother's trend must converge to the
    true slope and the horizon must extend it."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.forecast import MONTHLY_SQL, holt_sql, series_sql

    rows = []
    for i in range(48):
        d = datetime.datetime(2020, 1, 1) + datetime.timedelta(days=31 * i)
        d = datetime.datetime(2020 + (i // 12), i % 12 + 1, 15)
        rows.append((i + 1, d, 1000.0 + 50.0 * i))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    )
    df.createOrReplaceTempView("orders")
    view = "holt_series_test"
    spark.sql(
        f"WITH __holt_monthly AS ({MONTHLY_SQL}) {series_sql(SPARK)}"
    ).localCheckpoint(eager=True).createOrReplaceTempView(view)
    out = (
        spark.sql(holt_sql(SPARK, series_rel=view)).toPandas()
        .sort_values("month_key").reset_index(drop=True)
    )
    spark.catalog.dropTempView("orders")
    spark.catalog.dropTempView(view)
    fit = out[out["is_forecast"] == 0]
    # exact linear input: level tracks the line, trend equals the slope
    assert abs(fit["trend"].iloc[-1] - 50.0) < 1e-6
    assert abs(fit["err"].iloc[-1]) < 1e-6
    hor = out[out["is_forecast"] == 1]
    last_y = fit["revenue"].iloc[-1]
    for h in range(1, HORIZON + 1):
        assert abs(hor["forecast"].iloc[h - 1] - (last_y + 50.0 * h)) < 1e-5


def test_holt_series_spine_fills_gap_months(spark):
    """A calendar gap month must enter the recurrence as an explicit zero
    step — not be spliced out (the review-pass fix): with a gap, the
    series length equals the calendar span and the missing month carries
    y = 0."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.forecast import MONTHLY_SQL, series_sql

    rows = []
    k = 0
    for i in [0, 1, 3, 4]:  # month index 2 missing entirely
        d = datetime.datetime(2021, 1 + i, 15)
        rows.append((k := k + 1, d, 1000.0))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    series = (
        spark.sql(f"WITH __holt_monthly AS ({MONTHLY_SQL}) {series_sql(SPARK_D)}")
        .toPandas().sort_values("i").reset_index(drop=True)
    )
    spark.catalog.dropTempView("orders")
    assert len(series) == 5  # full calendar span, not 4 present months
    assert (series["month_key"].diff().dropna() == 1).all()
    assert series.loc[2, "y"] == 0.0  # the gap month, explicit zero
    assert series.loc[0, "y"] == 1000.0 and series.loc[4, "y"] == 1000.0
