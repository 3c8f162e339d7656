"""Late relational additions (relational.py): recursive hierarchy rollup."""

from __future__ import annotations


def test_hierarchy_rollup_matches_python(spark, sf_dir):
    """Tree-closure semantics recomputed independently: parent = key div
    10, subtree aggregates per ancestor."""
    from serene_spark.registry import load_all

    sup = {
        r["s_suppkey"]: float(r["s_acctbal"])
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    subtree: dict[int, dict] = {}
    for node, bal in sup.items():
        anc, depth = node, 0
        while True:
            d = subtree.setdefault(anc, {"n": 0, "bal": 0.0, "maxd": 0})
            d["n"] += 1
            d["bal"] += bal
            d["maxd"] = max(d["maxd"], depth)
            if anc < 10:
                break
            anc //= 10
            depth += 1

    rows = {r["ancestor"]: r
            for r in load_all()["supplier_hierarchy_rollup"].spark(spark, sf_dir).collect()}
    expected = {a: d for a, d in subtree.items() if d["n"] > 1}
    assert set(rows) == set(expected)
    for a, d in expected.items():
        r = rows[a]
        assert r["subtree_size"] == d["n"]
        assert abs(r["subtree_acctbal"] - round(d["bal"], 2)) < 0.01
        assert r["max_depth"] == d["maxd"]


def test_grouping_sets_grains(spark, sf_dir):
    """Exactly three grains, each internally consistent with the base."""
    from serene_spark.registry import load_all

    rows = load_all()["grouping_sets_orders"].spark(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["grouping_id"], []).append(r)
    # gid 1 = by status (year grouped), gid 2 = by year, gid 3 = grand total
    assert set(by_gid) == {1, 2, 3}
    total = by_gid[3][0]
    assert len(by_gid[3]) == 1
    assert sum(r["n_orders"] for r in by_gid[1]) == total["n_orders"]
    assert sum(r["n_orders"] for r in by_gid[2]) == total["n_orders"]
    assert abs(sum(r["total_price"] for r in by_gid[1]) - total["total_price"]) < 0.01
    for r in by_gid[1]:
        assert r["order_year"] == -1 and r["orderstatus"] != "<all>"
    for r in by_gid[2]:
        assert r["orderstatus"] == "<all>" and r["order_year"] > 0


def test_calendar_dim_spine(spark, sf_dir):
    """Contiguous spine, correct dow/weekend flags, zeros on empty days,
    counts conserve."""
    import datetime

    from serene_spark.registry import load_all

    rows = sorted(
        load_all()["calendar_dim_orders"].spark(spark, sf_dir).collect(),
        key=lambda r: r["epoch_day"],
    )
    days = [r["epoch_day"] for r in rows]
    assert days == list(range(days[0], days[-1] + 1))  # contiguous
    n_orders_total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders_total
    assert any(r["n_orders"] == 0 for r in rows) or len(rows) < 400
    for r in rows[:50]:
        date = datetime.date(1970, 1, 1) + datetime.timedelta(days=r["epoch_day"])
        assert r["dow"] == date.isoweekday() % 7
        assert r["is_weekend"] == int(r["dow"] in (0, 6))
        assert r["week_num"] == (r["epoch_day"] + 4) // 7


def test_order_backlog_sweep(spark, sf_dir):
    """Sweep-line backlog recomputed independently by interval membership."""
    from serene_spark.registry import load_all

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey",
        "CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) / 86400 AS BIGINT) AS od",
    ).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey",
        "CAST(unix_timestamp(CAST(l_shipdate AS TIMESTAMP)) / 86400 AS BIGINT) AS sd",
    ).toPandas()
    close = li.groupby("l_orderkey")["sd"].max() + 1
    intervals = orders.join(close.rename("cd"), on="o_orderkey", how="inner")
    intervals = intervals[intervals["cd"] > intervals["od"]]  # non-empty only

    rows = {r["epoch_day"]: r["open_orders"]
            for r in load_all()["order_backlog_daily"].spark(spark, sf_dir).collect()}
    # spot-check 15 days spread over the range by brute interval membership
    days = sorted(rows)
    for day in days[:: max(1, len(days) // 15)]:
        expected = int(((intervals["od"] <= day) & (day < intervals["cd"])).sum())
        assert rows[day] == expected, day
    # backlog returns to zero after the last close
    assert rows[days[-1]] == 0


def test_lead_time_pandas_recheck(spark):
    """Lead-time quantiles/means recomputed independently per priority."""
    import math

    import numpy as np

    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["lead_time_by_priority"].spark(spark, sf).toPandas()
    od = load_table(spark, sf, "orders").toPandas()
    li = load_table(spark, sf, "lineitem").toPandas()
    od["o_day"] = (od["o_orderdate"].astype("int64") // 10**9) // 86400
    li["s_day"] = (li["l_shipdate"].astype("int64") // 10**9) // 86400
    last = li.groupby("l_orderkey")["s_day"].max()
    df = od.join(last.rename("ship_day"), on="o_orderkey", how="inner")
    df["lead"] = df["ship_day"] - df["o_day"]
    assert len(out) == df["o_orderpriority"].nunique()
    for _, r in out.iterrows():
        v = np.sort(df[df["o_orderpriority"] == r["priority"]]["lead"].to_numpy())
        n = len(v)
        assert r["n_orders"] == n
        assert r["min_days"] == v[0] and r["max_days"] == v[-1]
        for q, col in ((0.5, "p50_days"), (0.9, "p90_days"), (0.99, "p99_days")):
            assert r[col] == v[math.ceil(n * q) - 1], (r["priority"], col)
        assert abs(r["mean_days"] - round(v.mean(), 6)) < 1e-6
    # the synthetic corpus ships some lines BEFORE order placement (the
    # same quirk order_backlog_daily documents); the lead-time report
    # must surface those as negative days, not clamp them — routing them
    # to a DQ constraint is the downstream pipeline's decision
    assert int(out["min_days"].min()) < 0


def test_supplier_hhi_pandas_recheck(spark):
    """HHI recomputed from revenue shares; bounds 1/n <= HHI <= 1."""
    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["supplier_hhi_by_nation"].spark(spark, sf).toPandas()
    li = load_table(spark, sf, "lineitem").toPandas()
    su = load_table(spark, sf, "supplier").toPandas()
    df = li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
    df["rev"] = df["l_extendedprice"].round(2)
    for _, r in out.iterrows():
        g = df[df["s_nationkey"] == r["nation"]]
        per = g.groupby("l_suppkey")["rev"].sum()
        shares = per / per.sum()
        hhi = float((shares**2).sum())
        assert r["n_suppliers"] == len(per)
        assert abs(r["hhi"] - round(hhi, 6)) < 2e-6
        assert 1.0 / len(per) - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
        assert r["concentrated"] == int(hhi > 0.25)
        assert abs(r["total_revenue"] - round(per.sum(), 2)) < 1e-6
