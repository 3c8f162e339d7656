"""Recommender / merchandising operators (operators/recsys.py) and the
Markov stationary distribution (operators/sequence.py) against independent
python/numpy references at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_abc_pareto_matches_python(spark):
    out = load_all()["abc_pareto_parts"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li["rev"] = (li.l_extendedprice.round(2) * (1 - li.l_discount.round(2))).round(4)
    rev = li.groupby("l_partkey")["rev"].sum().round(4)
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(v for _, v in order)
    cum, classes = 0.0, []
    for _k, v in order:
        cum = round(cum + v, 4)
        # exact decimal boundary: compare in integer 1e4-units to dodge floats
        cu, tu = round(cum * 10000), round(total * 10000)
        classes.append("A" if cu * 100 <= tu * 80 else ("B" if cu * 100 <= tu * 95 else "C"))
    want = Counter(classes)
    got = dict(zip(out.abc_class, out.n_parts))
    assert got == dict(want)
    assert set(out.abc_class) == {"A", "B", "C"}
    # classes partition the rank range contiguously and shares sum to 1
    out = out.sort_values("abc_class")
    assert list(out.first_rank)[0] == 1
    assert list(out.last_rank)[-1] == len(order)
    assert abs(out.revenue_share.sum() - 1.0) < 1e-4
    # by construction (rank-ordered cut) mean revenue per part declines A→B→C;
    # the synthetic corpus is NOT Pareto-skewed, so no claim on class sizes
    mean_rev = {r.abc_class: r.revenue / r.n_parts for r in out.itertuples()}
    assert mean_rev["A"] > mean_rev["B"] > mean_rev["C"]


def test_item_item_cosine_matches_python(spark):
    out = load_all()["item_item_cosine"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(lambda s: sorted(set(s)))
    part_s: Counter = Counter()
    pair_s: Counter = Counter()
    for items in baskets:
        part_s.update(items)
        from itertools import combinations

        pair_s.update(combinations(items, 2))
    neigh: dict[int, list] = {}
    for (a, b), c in pair_s.items():
        if c < 3:
            continue
        cos = round(c / math.sqrt(part_s[a] * part_s[b]), 6)
        neigh.setdefault(a, []).append((-cos, -c, b))
        neigh.setdefault(b, []).append((-cos, -c, a))
    expected = {}
    for p, lst in neigh.items():
        lst.sort()
        for pos, (ncos, nc, q) in enumerate(lst[:3], start=1):
            expected[(p, pos)] = (q, -nc, -ncos)
    assert len(out) == len(expected)
    for _, r in out.iterrows():
        q, c, cos = expected[(r["part"], r["pos"])]
        assert r["neighbor"] == q and r["n_co_orders"] == c
        assert abs(r["cosine"] - cos) < 1e-9
    # symmetry of the underlying metric: if (a→b) ranked, cosine(a,b)=cosine(b,a)
    pair_cos = {(r["part"], r["neighbor"]): r["cosine"] for _, r in out.iterrows()}
    for (a, b), cos in pair_cos.items():
        if (b, a) in pair_cos:
            assert pair_cos[(b, a)] == cos


def test_wilson_rank_matches_python(spark):
    out = load_all()["wilson_return_rank"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    g = li.groupby("l_partkey").agg(
        n=("l_returnflag", "size"), r=("l_returnflag", lambda s: (s == "R").sum())
    )
    g = g[g.n >= 5]
    z = 1.96
    rows = []
    for k, row in g.iterrows():
        n, r = float(row.n), float(row.r)
        p = r / n
        lb = (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n
        )
        rows.append((round(lb, 6), k, int(row.n), int(row.r)))
    rows.sort(key=lambda t: (-t[0], t[1]))
    assert len(out) == min(20, len(rows))
    for i, (_, r) in enumerate(out.sort_values("pos").iterrows()):
        lb, k, n, ret = rows[i]
        assert r["l_partkey"] == k and r["n_lineitems"] == n and r["n_returned"] == ret
        assert abs(r["wilson_lower"] - lb) < 1e-9
        # the lower bound is strictly below the raw rate whenever r>0
        if ret > 0:
            assert r["wilson_lower"] < r["raw_rate"]


def test_markov_stationary_matches_numpy(spark):
    out = load_all()["markov_stationary"].spark(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    trans: Counter = Counter()
    for _uid, grp in ev.groupby("user_id"):
        types = list(grp.event_type)
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    states = sorted(ev.event_type.unique())
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for (a, b), c in trans.items():
        P[idx[a], idx[b]] = c
    row = P.sum(axis=1, keepdims=True)
    P = np.round(np.divide(P, row, where=row > 0), 9)
    pi = np.full(k, round(1.0 / k, 9))
    for _ in range(3):
        pi = np.round(pi @ P, 9)  # per-step re-quantization mirrors the SQL
    got = dict(zip(out.event_type, out.pi_stationary))
    for s in states:
        assert abs(got[s] - round(pi[idx[s]], 6)) < 2e-6
    # mass is conserved (sub-stochastic loss only from terminal-event rows)
    assert 0.99 < out.pi_stationary.sum() <= 1.000001
    # empirical share is a genuine distribution and n_events matches
    assert abs(out.empirical_share.sum() - 1.0) < 1e-4
    assert out.n_events.sum() == len(ev)


def test_abc_xyz_matches_python(spark):
    out = load_all()["abc_xyz_matrix"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li["qty"] = li.l_quantity.round(2)
    li["qtr"] = li.l_shipdate.dt.year * 4 + (li.l_shipdate.dt.month - 1) // 3
    quarters = sorted(li.qtr.unique())
    xyz = {}
    for part, grp in li.groupby("l_partkey"):
        per_q = grp.groupby("qtr")["qty"].sum()
        vals = [round(float(per_q.get(q, 0.0)), 2) for q in quarters]
        n = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        if s1 == 0:
            xyz[part] = "Z"
            continue
        cv = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n)
        xyz[part] = "X" if cv <= 0.5 else ("Y" if cv <= 1.0 else "Z")
    # ABC classes from the shared reference logic (already validated above)
    li["rev"] = (li.l_extendedprice.round(2) * (1 - li.l_discount.round(2))).round(4)
    rev = li.groupby("l_partkey")["rev"].sum().round(4)
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = round(sum(v for _, v in order) * 10000)
    cum, abc = 0, {}
    for k, v in order:
        cum += round(v * 10000)
        abc[k] = "A" if cum * 100 <= total * 80 else ("B" if cum * 100 <= total * 95 else "C")
    want = Counter((abc[p], xyz[p]) for p in abc)
    got = {(r.abc_class, r.xyz_class): r.n_parts for r in out.itertuples()}
    assert got == dict(want)
    assert abs(out.revenue_share.sum() - 1.0) < 1e-4


def test_did_promo_is_null_calibrated(spark):
    row = load_all()["did_promo_revenue"].spark(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    pt = spark.read.parquet(f"{SF}/part.parquet").toPandas()
    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    m["rev"] = (m.l_extendedprice.round(2) * (1 - m.l_discount.round(2))).round(4)
    m["treated"] = (m.p_type == "PROMO").astype(int)
    m["post"] = (m.l_shipdate >= "1999-01-01").astype(int)
    cells = m.groupby(["treated", "post"])["rev"].agg(["sum", "size"])
    mean = {k: round(round(v["sum"], 4) / v["size"], 6) for k, v in cells.iterrows()}
    assert row["treated_pre_mean"] == mean[(1, 0)]
    assert row["treated_post_mean"] == mean[(1, 1)]
    assert row["control_pre_mean"] == mean[(0, 0)]
    assert row["control_post_mean"] == mean[(0, 1)]
    assert row["n_lineitems"] == len(m)
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    assert abs(row["did_estimate"] - round(did, 6)) < 1e-6
    # no intervention exists in the synthetic corpus: the estimate is an
    # A/A calibration and must be small relative to the outcome scale
    scale = mean[(0, 0)]
    assert abs(row["did_estimate"]) < 0.15 * scale


def test_als_block_preference_recovery_and_determinism(spark, tmp_path):
    """ALS on a block-structured implicit matrix: users in block A buy
    only A-items (with some held out), likewise B; the factorization must
    rank held-out IN-block items above cross-block items, and a re-fit
    with the same seed must reproduce the output exactly."""
    import numpy as np
    import pandas as pd

    from serene_spark.operators.recsys import als_recommend

    rng = np.random.default_rng(7)
    rows_li, rows_o = [], []
    order_id = 0
    # 20 users x 2 blocks; each buys 12 of their block's 20 items (8 held out)
    for u in range(20):
        block = u // 10
        items = rng.permutation(np.arange(block * 20, block * 20 + 20))[:12]
        for it in items:
            rows_o.append({"o_orderkey": order_id, "o_custkey": u,
                           "o_orderstatus": "F", "o_totalprice": 1.0,
                           "o_orderdate": pd.Timestamp("1997-01-01"),
                           "o_orderpriority": "1-URGENT"})
            rows_li.append({"l_orderkey": order_id, "l_partkey": int(it),
                            "l_suppkey": 0, "l_quantity": 5.0,
                            "l_extendedprice": 1.0, "l_discount": 0.0,
                            "l_returnflag": "N", "l_shipdate":
                            pd.Timestamp("1997-01-02")})
            order_id += 1
    fixture = tmp_path / "als_fx"
    fixture.mkdir()
    spark.createDataFrame(pd.DataFrame(rows_o)).write.parquet(
        str(fixture / "orders.parquet"))
    spark.createDataFrame(pd.DataFrame(rows_li)).write.parquet(
        str(fixture / "lineitem.parquet"))

    got = als_recommend(spark, str(fixture)).toPandas()
    # every user got recommendations, all for UNPURCHASED items
    assert set(got.c_custkey) == set(range(20))
    # block recovery: recommended items live in the user's own block
    in_block = (got.p_partkey // 20) == (got.c_custkey // 10)
    assert in_block.mean() >= 0.9, got[~in_block]

    again = als_recommend(spark, str(fixture)).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), again.reset_index(drop=True))
