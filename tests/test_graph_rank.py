"""PageRank (operators/graph_rank.py).

Oracle parity (Spark == DuckDB on the unrolled iterations) runs in the
driver gate; these pin the math against an independent numpy power-iteration
reference and the structural invariants.
"""

from __future__ import annotations

import numpy as np

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _reference(spark):
    """Same formula, computed independently with numpy doubles."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    sup = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    cs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    pairs = cs.merge(cs, on="o_custkey")
    edges = {
        (a, b)
        for a, b in zip(pairs["l_suppkey_x"], pairs["l_suppkey_y"])
        if a != b
    }
    nodes = sorted(sup["s_suppkey"])
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _b in edges:
        outdeg[idx[a]] += 1
    rank = np.full(n, round(1.0 / n, 9))
    for _ in range(3):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += round(0.85 * rank[idx[a]] / outdeg[idx[a]], 9)
        rank = np.round((1 - 0.85) / n + contrib, 9)
    return nodes, idx, rank, outdeg


def test_pagerank_matches_numpy_reference(spark):
    out = load_all()["pagerank_suppliers"].spark(spark, SF).toPandas()
    nodes, idx, rank, outdeg = _reference(spark)
    assert set(out["s_suppkey"]) == set(nodes)
    for _, row in out.iterrows():
        i = idx[row["s_suppkey"]]
        assert abs(row["pagerank"] - round(rank[i], 6)) < 2e-6, row
        assert row["degree"] == outdeg[i]


def test_pagerank_invariants(spark):
    out = load_all()["pagerank_suppliers"].spark(spark, SF).toPandas()
    assert (out["pagerank"] > 0).all()
    n = len(out)
    # mass is bounded by 1 (no dangling redistribution -> sum <= 1 + eps)
    assert out["pagerank"].sum() <= 1.0 + 1e-3
    # teleport floor for edge-less nodes
    floor = round((1 - 0.85) / n, 6)
    assert (out[out["degree"] == 0]["pagerank"] == floor).all()
    # rank correlates with degree (connected graph sanity)
    top = out.nlargest(10, "pagerank")["degree"].mean()
    bot = out.nsmallest(10, "pagerank")["degree"].mean()
    assert top >= bot


def test_pagerank_converged_truncation_equals_unrolled(spark):
    """3 forced sweeps of the convergence loop == the unrolled 3-iteration
    oracle query, row-for-row — the bounded query is demonstrably a
    truncation of the same recurrence (round-4 verdict item #5)."""
    from serene_spark.operators.graph_rank import pagerank_converged_run

    out, n_iters, _d = pagerank_converged_run(spark, SF, tol=0.0, max_iter=3)
    assert n_iters == 3
    looped = {r["s_suppkey"]: (r["degree"], r["pagerank"]) for r in out.collect()}
    unrolled = {
        r["s_suppkey"]: (r["degree"], r["pagerank"])
        for r in load_all()["pagerank_suppliers"].spark(spark, SF).collect()
    }
    assert looped == unrolled


def _numpy_fixed_point(spark, tol):
    """The same recurrence (incl. 9-dp rounding) run in numpy until
    max |Δrank| <= tol; returns (idx map, rank vector, n_iters)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    sup = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    cs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_suppkey"]
        ].drop_duplicates()
    )
    pairs = cs.merge(cs, on="o_custkey")
    edges = {
        (a, b) for a, b in zip(pairs["l_suppkey_x"], pairs["l_suppkey_y"]) if a != b
    }
    nodes = sorted(sup["s_suppkey"])
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _b in edges:
        outdeg[idx[a]] += 1
    rank = np.full(n, round(1.0 / n, 9))
    for it in range(1, 201):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += round(0.85 * rank[idx[a]] / outdeg[idx[a]], 9)
        new = np.round((1 - 0.85) / n + contrib, 9)
        delta = np.abs(new - rank).max()
        rank = new
        if delta <= tol:
            return idx, rank, it
    raise AssertionError("numpy reference did not converge")


def test_pagerank_converged_fixed_point(spark):
    """The registered query reaches the fixed point (delta <= tol inside the
    sweep budget) and its ranks equal a numpy power iteration of the same
    rounded recurrence run to the same tolerance."""
    from serene_spark.operators.graph_rank import (
        CONVERGE_TOL,
        pagerank_converged_run,
    )

    out, n_iters, delta = pagerank_converged_run(spark, SF)
    # sf0.001's co-purchase graph is near-regular -> near-uniform fixed point
    # reached in very few sweeps; the budget bound is what matters
    assert delta <= CONVERGE_TOL and 1 <= n_iters < 60
    idx, ref_rank, ref_iters = _numpy_fixed_point(spark, CONVERGE_TOL)
    assert n_iters == ref_iters
    got = {r["s_suppkey"]: r["pagerank"] for r in out.collect()}
    assert set(got) == set(idx)
    for k, v in got.items():
        assert abs(v - round(ref_rank[idx[k]], 6)) < 2e-6, (k, v, ref_rank[idx[k]])
    # the registered rows-only query reports the sweep count it took
    rows = load_all()["pagerank_converged"].spark(spark, SF).limit(5).collect()
    assert rows and all(r["n_iters"] == n_iters for r in rows)
