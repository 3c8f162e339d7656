"""Drift detection (operators/drift.py).

Oracle parity runs in the driver gate; these pin the statistics against
scipy/pandas references and the detector's response to injected drift.
"""

from __future__ import annotations

import numpy as np

from serene_spark.operators.drift import PSI_BINS, SPLIT_TS
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _sides(spark):
    from serene_spark.catalog import load_table

    ev = load_table(spark, SF, "events").toPandas()
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = ev["value"].round(2)  # DECIMAL(18,2) cast
    import pandas as pd

    split = pd.Timestamp(SPLIT_TS)
    return ev[ev["ts"] < split], ev[ev["ts"] >= split]


def _ks_2samp(ra: np.ndarray, rb: np.ndarray) -> float:
    """Two-sample KS statistic from ECDFs (scipy is not in the container)."""
    grid = np.unique(np.concatenate([ra, rb]))
    fa = np.searchsorted(np.sort(ra), grid, side="right") / len(ra)
    fb = np.searchsorted(np.sort(rb), grid, side="right") / len(rb)
    return float(np.abs(fa - fb).max())


def test_ks_matches_ecdf_reference(spark):
    out = load_all()["drift_ks_events"].spark(spark, SF).toPandas()
    a, b = _sides(spark)
    for et in out["event_type"]:
        ra = a[a.event_type == et]["v"].to_numpy()
        rb = b[b.event_type == et]["v"].to_numpy()
        ref = _ks_2samp(ra, rb)
        row = out[out.event_type == et].iloc[0]
        assert abs(row["ks_stat"] - round(ref, 6)) < 2e-6, (et, row["ks_stat"], ref)
        assert row["n_ref"] == len(ra) and row["n_cur"] == len(rb)


def test_psi_matches_python(spark):
    out = load_all()["drift_psi_events"].spark(spark, SF).toPandas()
    a, b = _sides(spark)
    for et in out["event_type"]:
        ra = a[a.event_type == et]["v"].to_numpy()
        rb = b[b.event_type == et]["v"].to_numpy()
        # integer-cent arithmetic mirrors the DECIMAL(18,2) SQL exactly:
        # bin = floor(BINS * (v - lo) / (hi - lo + 0.01)) in cents
        ca_c = np.round(ra * 100).astype(np.int64)
        cb_c = np.round(rb * 100).astype(np.int64)
        lo_c = min(ca_c.min(), cb_c.min())
        hi_c = max(ca_c.max(), cb_c.max())
        span = hi_c - lo_c + 1
        bins_a = np.minimum(PSI_BINS * (ca_c - lo_c) // span, PSI_BINS - 1)
        bins_b = np.minimum(PSI_BINS * (cb_c - lo_c) // span, PSI_BINS - 1)
        psi = 0.0
        for k in range(PSI_BINS):
            ca = (bins_a == k).sum()
            cb = (bins_b == k).sum()
            pa = (ca + 0.5) / (len(ra) + PSI_BINS * 0.5)
            pb = (cb + 0.5) / (len(rb) + PSI_BINS * 0.5)
            psi += round((pa - pb) * np.log(pa / pb), 9)
        row = out[out.event_type == et].iloc[0]
        assert abs(row["psi"] - round(psi, 6)) < 1e-5, (et, row["psi"], psi)


def test_no_drift_on_homogeneous_corpus_but_detects_injected(spark):
    """The synthetic corpus is time-homogeneous, so nothing should flag;
    an injected mean shift in the 'current' slice must flag."""
    out_ks = load_all()["drift_ks_events"].spark(spark, SF).toPandas()
    out_psi = load_all()["drift_psi_events"].spark(spark, SF).toPandas()
    assert (out_ks["drifted"] == 0).all()
    assert (out_psi["drifted"] == 0).all()

    from pyspark.sql import functions as F

    from serene_spark.catalog import load_table
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.drift import drift_ks_sql, drift_psi_sql

    ev = load_table(spark, SF, "events")
    shifted = ev.withColumn(
        "value",
        F.when(
            (F.col("ts") >= F.lit(SPLIT_TS).cast("timestamp"))
            & (F.col("event_type") == "click"),
            F.col("value") * 3 + 50,
        ).otherwise(F.col("value")),
    )
    shifted.createOrReplaceTempView("events")
    ks = {r["event_type"]: r for r in spark.sql(drift_ks_sql(SPARK)).collect()}
    psi = {r["event_type"]: r for r in spark.sql(drift_psi_sql(SPARK)).collect()}
    assert ks["click"]["drifted"] == 1 and psi["click"]["drifted"] == 1
    assert ks["view"]["drifted"] == 0  # untouched types stay quiet
    spark.catalog.dropTempView("events")


def test_brand_new_event_type_flags_as_drift(spark):
    """A type present on only one side of the split is definitional drift
    (D = 1 vs an empty distribution) — the guard that stops the 0-count
    NULLs from falling through to drifted = 0."""
    from pyspark.sql import functions as F

    from serene_spark.catalog import load_table
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.drift import drift_ks_sql

    ev = load_table(spark, SF, "events")
    renamed = ev.withColumn(
        "event_type",
        F.when(
            (F.col("ts") >= F.lit(SPLIT_TS).cast("timestamp"))
            & (F.col("event_type") == "signup"),
            F.lit("signup_v2"),  # exists only AFTER the split
        ).otherwise(F.col("event_type")),
    )
    renamed.createOrReplaceTempView("events")
    rows = {r["event_type"]: r for r in spark.sql(drift_ks_sql(SPARK)).collect()}
    assert rows["signup_v2"]["n_ref"] == 0
    assert rows["signup_v2"]["ks_stat"] == 1.0
    assert rows["signup_v2"]["drifted"] == 1
    assert rows["signup_v2"]["ks_crit"] is None
    # the truncated original also drifts one-sided if fully absent after;
    # 'signup' keeps its pre-split rows so it must carry real statistics
    assert rows["signup"]["n_ref"] > 0
    spark.catalog.dropTempView("events")


def _cusum_reference(rev: np.ndarray):
    """Textbook standardized-CUSUM bridge: returns (path, cp_idx, stat)."""
    mu = rev.mean()
    sd = rev.std()  # population std, matching the SQL's /n
    z = (rev - mu) / sd
    path = np.cumsum(z)
    cp = int(np.abs(path).argmax())  # ties: argmax takes the earliest
    return path, cp, float(np.abs(path).max() / np.sqrt(len(rev)))


def test_cusum_matches_numpy(spark):
    out = (
        load_all()["cusum_daily_revenue"].spark(spark, SF).toPandas()
        .sort_values("epoch_day").reset_index(drop=True)
    )
    path, cp, stat = _cusum_reference(out["revenue"].to_numpy())
    assert np.abs(out["cusum"].to_numpy() - path).max() < 2e-6
    assert out.loc[cp, "is_changepoint"] == 1
    assert out["is_changepoint"].sum() == 1
    assert abs(out["bridge_stat"].iloc[0] - stat) < 2e-6
    # the path is a bridge: it must return to ~0 at the horizon
    assert abs(out["cusum"].iloc[-1]) < 1e-4
    # spine completeness: consecutive days, no gaps
    days = out["epoch_day"].to_numpy()
    assert (np.diff(days) == 1).all()


def test_cusum_locates_injected_level_shift(spark):
    """A clean level shift at a known day must (a) trip the 1.358 bridge
    bound and (b) place the argmax exactly at the last pre-shift day
    (where the bridge's expected path peaks)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.drift import cusum_sql

    base = datetime.datetime(2020, 1, 1)
    rows = []
    rng = np.random.default_rng(11)
    for i in range(400):
        price = 100.0 + (80.0 if i >= 250 else 0.0) + float(rng.normal(0, 5))
        rows.append((i + 1, base + datetime.timedelta(days=i), round(price, 2)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    )
    df.createOrReplaceTempView("orders")
    out = (
        spark.sql(cusum_sql(SPARK)).toPandas()
        .sort_values("epoch_day").reset_index(drop=True)
    )
    spark.catalog.dropTempView("orders")
    assert out["shift_detected"].iloc[0] == 1
    assert out["bridge_stat"].iloc[0] > 1.358
    cp_idx = int(out.index[out["is_changepoint"] == 1][0])
    # expected argmax = day 249, the last pre-shift day; the sigma=5 noise
    # against an 80-unit shift cannot move it more than a step or two
    assert abs(cp_idx - 249) <= 2, cp_idx
    # path shape: pre-shift segment drifts below the mean and holds the
    # global minimum; the bridge closes back to ~0 at the horizon
    assert out["cusum"].iloc[:250].min() == out["cusum"].min()
    assert abs(out["cusum"].iloc[-1]) < 1e-4


def test_mad_outliers_matches_numpy(spark):
    """Median/MAD/modified-z recomputed independently; the ceil-rank
    median convention must match exactly."""
    out = (
        load_all()["robust_outliers_daily"].spark(spark, SF).toPandas()
        .sort_values("epoch_day").reset_index(drop=True)
    )
    rev = out["revenue"].to_numpy()
    sv = np.sort(rev)
    med = sv[int(np.ceil(len(sv) / 2)) - 1]  # value at cc >= ceil(n/2)
    adev = np.sort(np.round(np.abs(rev - med), 2))
    mad = adev[int(np.ceil(len(adev) / 2)) - 1]
    assert abs(out["median_rev"].iloc[0] - med) < 1e-9
    assert abs(out["mad"].iloc[0] - mad) < 1e-9
    z = 0.6745 * (rev - med) / mad
    assert np.abs(out["robust_z"].to_numpy() - np.round(z, 6)).max() < 2e-6
    assert (out["is_outlier"].to_numpy() == (np.abs(z) > 3.5).astype(int)).all()


def test_mad_outliers_resist_contamination(spark):
    """The robust property itself: injecting extreme days must NOT move
    the median/MAD materially (50% breakdown), and the injected days must
    all be flagged — the mean/std detector's threshold would have been
    dragged by the same contamination."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.drift import mad_outliers_sql

    rng = np.random.default_rng(5)
    base = datetime.datetime(2021, 1, 1)
    rows = []
    k = 0
    for i in range(300):
        price = float(np.round(rng.normal(1000, 50), 2))
        rows.append((k := k + 1, base + datetime.timedelta(days=i), price))
    # 20 contaminated days at 100x
    for i in range(300, 320):
        rows.append((k := k + 1, base + datetime.timedelta(days=i), 100000.0))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    out = spark.sql(mad_outliers_sql(SPARK_D)).toPandas()
    spark.catalog.dropTempView("orders")
    flagged = out[out["revenue"] >= 99999.0]
    assert len(flagged) == 20 and (flagged["is_outlier"] == 1).all()
    assert abs(out["median_rev"].iloc[0] - 1000) < 25  # unmoved by contamination
    # clean days essentially unflagged
    clean = out[out["revenue"] < 99999.0]
    assert clean["is_outlier"].mean() < 0.02
