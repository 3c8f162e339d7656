"""Chi-square + Mann-Whitney U (operators/hypothesis_tests.py).

Oracle parity runs in the driver gate; these pin both statistics against
numpy references computed from first principles (scipy is not in the
container) and the tests' response to injected effects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.operators.hypothesis_tests import MWU_SIDE_A, MWU_SIDE_B
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _events(spark) -> pd.DataFrame:
    from serene_spark.catalog import load_table

    return load_table(spark, SF, "events").toPandas()


def test_chisq_matches_numpy(spark):
    out = load_all()["chisq_type_dow"].spark(spark, SF).toPandas()
    ev = _events(spark)
    ev["dow"] = ((ev["ts"].astype("int64") // 10**9) // 86400 + 4) % 7
    ct = pd.crosstab(ev["event_type"], ev["dow"])
    # complete grid including structural zeros
    obs = ct.reindex(columns=range(7), fill_value=0) if ct.shape[1] < 7 else ct
    o = obs.to_numpy(dtype=float)
    e = o.sum(axis=1, keepdims=True) @ o.sum(axis=0, keepdims=True) / o.sum()
    chi2 = float(((o - e) ** 2 / e).sum())
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    assert len(out) == o.size
    assert out["dof"].iloc[0] == dof
    assert abs(out["chi2_total"].iloc[0] - chi2) < 2e-6
    # cell-level agreement
    for _, row in out.iterrows():
        oij = obs.loc[row["event_type"], row["dow"]]
        assert row["n_obs"] == oij
    # observed margins reproduce
    assert int(out["n_obs"].sum()) == len(ev)


def test_chisq_detects_injected_dependence(spark):
    """A type pinned to one weekday must inflate chi2 far past the 5x7
    99th-percentile critical value (dof=24 -> 42.98)."""
    ev = _events(spark)
    ev["dow"] = ((ev["ts"].astype("int64") // 10**9) // 86400 + 4) % 7
    base = pd.crosstab(ev["event_type"], ev["dow"]).to_numpy(dtype=float)

    def chi2_of(o):
        e = o.sum(axis=1, keepdims=True) @ o.sum(axis=0, keepdims=True) / o.sum()
        return float(((o - e) ** 2 / e).sum())

    skewed = base.copy()
    skewed[0, :] = 0
    skewed[0, 3] = base[0, :].sum()  # all of type 0 lands on Wednesday
    assert chi2_of(skewed) > 42.98
    assert chi2_of(skewed) > chi2_of(base) + 100


def _mwu_reference(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """U statistic for side a + tie-corrected z, textbook formulas."""
    allv = np.concatenate([a, b])
    order = allv.argsort(kind="mergesort")
    ranks = np.empty(len(allv))
    # average ranks for ties
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    ra = ranks[: len(a)].sum()
    na, nb = len(a), len(b)
    u_a = ra - na * (na + 1) / 2.0
    n = na + nb
    _, t = np.unique(allv, return_counts=True)
    tie = (t**3 - t).sum()
    sigma = np.sqrt(na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1))))
    z = (u_a - na * nb / 2.0) / sigma
    return u_a, z


def test_mwu_matches_numpy(spark):
    out = load_all()["mannwhitney_value"].spark(spark, SF).toPandas().iloc[0]
    ev = _events(spark)
    ev = ev[ev["value"].notna()]
    a = ev[ev.event_type == MWU_SIDE_A]["value"].round(2).to_numpy()
    b = ev[ev.event_type == MWU_SIDE_B]["value"].round(2).to_numpy()
    u_a, z = _mwu_reference(a, b)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["u_a"] - u_a) < 1e-9
    assert abs(out["u_a"] + out["u_b"] - len(a) * len(b)) < 1e-9
    assert abs(out["z"] - z) < 2e-6
    assert out["reject_95"] == int(abs(z) > 1.959964)


def test_mwu_detects_injected_shift():
    """A location-shifted sample must push |z| past the 95% bound, and the
    doubled-rank integer algebra must match the float reference under
    heavy ties."""
    rng = np.random.default_rng(7)
    a = np.round(rng.normal(10, 2, 400), 1)  # 1-dp rounding -> many ties
    b = np.round(rng.normal(11, 2, 400), 1)
    u_a, z = _mwu_reference(a, b)
    assert abs(z) > 1.959964
    # integer doubled-rank recomputation (the SQL's algebra) agrees exactly
    import collections

    cnt_a = collections.Counter(a.tolist())
    cnt_b = collections.Counter(b.tolist())
    vals = sorted(set(cnt_a) | set(cnt_b))
    cum = 0
    ra2 = 0
    for v in vals:
        t = cnt_a[v] + cnt_b[v]
        ra2 += cnt_a[v] * (2 * cum + t + 1)
        cum += t
    u_int = (ra2 - len(a) * (len(a) + 1)) / 2.0
    assert abs(u_int - u_a) < 1e-9


def test_benford_matches_numpy(spark):
    out = load_all()["benford_audit_prices"].spark(spark, SF).toPandas()
    from serene_spark.catalog import load_table

    od = load_table(spark, SF, "orders").toPandas()
    first = od["o_totalprice"].round(2).astype(str).str[0].astype(int)
    n = len(first)
    assert len(out) == 9
    exp = np.log10(1 + 1 / np.arange(1, 10))
    obs = np.array([(first == d).sum() for d in range(1, 10)])
    assert (out.sort_values("digit")["n_obs"].to_numpy() == obs).all()
    chi2 = (((obs - exp * n) ** 2) / (exp * n)).sum()
    mad = np.abs(obs / n - exp).mean()
    assert abs(out["chi2_total"].iloc[0] - chi2) < 2e-6
    assert abs(out["mad"].iloc[0] - mad) < 2e-6
    band = out["conformity"].iloc[0]
    m = out["mad"].iloc[0]
    expect = (
        "close" if m <= 0.006 else
        "acceptable" if m <= 0.012 else
        "marginal" if m <= 0.015 else "nonconforming"
    )
    assert band == expect


def test_benford_separates_conforming_from_uniform(spark):
    """A log-uniform (Benford-conforming by construction) sample must land
    in the close band; a uniform sample must be flagged nonconforming."""
    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.hypothesis_tests import benford_sql

    rng = np.random.default_rng(3)

    def run(prices):
        df = pd.DataFrame(
            {"o_orderkey": np.arange(len(prices)) + 1, "o_totalprice": prices}
        )
        sdf = spark.createDataFrame(df)
        sdf.createOrReplaceTempView("orders")
        got = spark.sql(benford_sql(SPARK_D)).toPandas()
        spark.catalog.dropTempView("orders")
        return got

    benford = np.round(10 ** rng.uniform(2, 6, 20000), 2)  # log-uniform
    uniform = np.round(rng.uniform(100, 999, 20000), 2)    # first digits 1-9 uniform
    b = run(benford)
    u = run(uniform)
    assert b["mad"].iloc[0] <= 0.006 and b["conformity"].iloc[0] == "close"
    assert u["mad"].iloc[0] > 0.015 and u["conformity"].iloc[0] == "nonconforming"
    assert u["chi2_total"].iloc[0] > b["chi2_total"].iloc[0] * 10


def _kw_reference(groups: list[np.ndarray]) -> float:
    """Tie-corrected Kruskal-Wallis H, textbook formulas."""
    allv = np.concatenate(groups)
    n = len(allv)
    order = allv.argsort(kind="mergesort")
    ranks = np.empty(n)
    sv = allv[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    off = 0
    h = 0.0
    for g in groups:
        rg = ranks[off : off + len(g)].sum()
        h += rg * rg / len(g)
        off += len(g)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, t = np.unique(allv, return_counts=True)
    corr = 1 - (t**3 - t).sum() / (n**3 - n)
    return h / corr


def test_kruskal_matches_numpy(spark):
    out = load_all()["kruskal_wallis_value"].spark(spark, SF).toPandas()
    ev = _events(spark)
    ev = ev[ev["value"].notna()]
    types = sorted(ev["event_type"].unique())
    groups = [ev[ev.event_type == t]["value"].round(2).to_numpy() for t in types]
    h = _kw_reference(groups)
    assert sorted(out["event_type"]) == types
    assert abs(out["h_stat"].iloc[0] - round(h, 6)) < 2e-6
    assert out["dof"].iloc[0] == len(types) - 1
    crit = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729}[len(types) - 1]
    assert out["reject_95"].iloc[0] == int(h > crit)
    # per-group n and mean rank agree
    allv = np.concatenate(groups)
    order = allv.argsort(kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    off = 0
    for t, g in zip(types, groups):
        r = out[out["event_type"] == t].iloc[0]
        assert r["n"] == len(g)
        mr = ranks[off : off + len(g)].mean()
        assert abs(r["mean_rank"] - round(mr, 6)) < 2e-6
        off += len(g)


def test_kruskal_detects_injected_group_shift(spark):
    """Shifting one group's values must flip the omnibus decision."""
    from pyspark.sql import functions as F

    from serene_spark.catalog import load_table
    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.hypothesis_tests import kruskal_sql

    ev = load_table(spark, SF, "events")
    shifted = ev.withColumn(
        "value",
        F.when(F.col("event_type") == "signup", F.col("value") + 1000.0)
        .otherwise(F.col("value")),
    )
    shifted.createOrReplaceTempView("events")
    shifted_out = spark.sql(kruskal_sql(SPARK_D)).toPandas()
    spark.catalog.dropTempView("events")
    assert shifted_out["reject_95"].iloc[0] == 1
    # the shifted group holds the top mean rank by a wide margin
    top = shifted_out.sort_values("mean_rank").iloc[-1]
    assert top["event_type"] == "signup"


def test_degenerate_guards_raise_nothing(spark):
    """ANSI Spark raises on 0/0 where DuckDB NULLs — the degenerate
    guards must emit NULL (undecidable) on all-tied samples instead of
    crashing (second-review fix)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.hypothesis_tests import kruskal_sql, mwu_sql

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), i % 3,
         ["click", "purchase", "view"][i % 3], 7.0, "{}")  # ONE tied value
        for i in range(30)
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(ev).createOrReplaceTempView("events")
    [m] = spark.sql(mwu_sql(SPARK_D)).collect()
    kw = spark.sql(kruskal_sql(SPARK_D)).collect()
    spark.catalog.dropTempView("events")
    assert m["z"] is None and m["reject_95"] is None  # undecidable, not 0
    assert m["u_a"] == m["u_b"]  # all tied -> U at its null midpoint
    assert all(r["h_stat"] is None and r["reject_95"] is None for r in kw)
