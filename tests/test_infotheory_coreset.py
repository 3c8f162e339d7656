"""Mutual information, greedy k-center selection, and k-core decomposition
against independent python/numpy/networkx references."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_mutual_info_matches_python(spark):
    out = load_all()["mutual_info_orders"].spark(spark, SF).toPandas()
    od = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    cols = {
        "status": od.o_orderstatus,
        "priority": od.o_orderpriority,
        "oyear": od.o_orderdate.dt.year.astype("int64"),
    }
    n = len(od)

    def H(s):
        return -sum((c / n) * math.log2(c / n) for c in Counter(s).values())

    def MI(a, b):
        ca, cb = Counter(cols[a]), Counter(cols[b])
        cab = Counter(zip(cols[a], cols[b]))
        return sum(
            (c / n) * math.log2(c * n / (ca[x] * cb[y])) for (x, y), c in cab.items()
        )

    got = {r.pair: r for r in out.itertuples()}
    assert set(got) == {"status|priority", "status|oyear", "priority|oyear"}
    for a, b in (("status", "priority"), ("status", "oyear"), ("priority", "oyear")):
        r = got[f"{a}|{b}"]
        assert abs(r.mi_bits - MI(a, b)) < 1e-5
        assert abs(r.h_x - H(cols[a])) < 1e-5
        assert abs(r.h_y - H(cols[b])) < 1e-5
        assert abs(r.nmi - MI(a, b) / min(H(cols[a]), H(cols[b]))) < 1e-4
        # MI is bounded by both entropies; NMI in [0, 1]
        assert -1e-9 <= r.mi_bits <= min(r.h_x, r.h_y) + 1e-6
        assert -1e-9 <= r.nmi <= 1 + 1e-9


def test_kcenter_matches_numpy_greedy(spark):
    out = (
        load_all()["kcenter_select"].spark(spark, SF).toPandas().sort_values("sel_order")
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    ids = emb.vec_id.to_numpy()
    X = np.floor(np.stack(emb.embedding.to_numpy()).astype("float64") * 1_000_000).astype(
        "int64"
    )
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    sel = [0]  # lowest vec_id
    d = ((X - X[0]) ** 2).sum(axis=1)
    want = [(int(ids[0]), int(d.max()))]
    for _ in range(4):
        # argmax with min-vec_id tie-break (ids sorted → first argmax)
        j = int(np.argmax(d))
        nd = ((X - X[j]) ** 2).sum(axis=1)
        d = np.minimum(d, nd)
        sel.append(j)
        want.append((int(ids[j]), int(d.max())))
    got = list(zip(out.vec_id, out.radius_sq))
    assert got == want
    # the coverage radius is monotone non-increasing
    assert all(a >= b for (_, a), (_, b) in zip(want, want[1:]))


def _nx_core(edge_list):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edge_list)
    return nx.core_number(g)


def test_kcore_matches_networkx_on_corpus(spark):
    out = load_all()["kcore_suppliers"].spark(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    od = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    cs = m[["o_custkey", "l_suppkey"]].drop_duplicates()
    pairs = cs.merge(cs, on="o_custkey")
    edges = {
        (a, b)
        for a, b in zip(pairs.l_suppkey_x, pairs.l_suppkey_y)
        if a < b
    }
    want = _nx_core(edges)
    got = dict(zip(out.s_suppkey, out.core_number))
    assert got == want
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edges)
    assert dict(zip(out.s_suppkey, out.degree)) == dict(g.degree())


def test_kcore_synthetic_mixed_topology(spark):
    """Clique + path + star, where core numbers actually differ by node —
    the corpus graph is complete, so this is where the recurrence is
    exercised."""
    from serene_spark.operators.graph_analytics import core_numbers

    clique = [(i, j) for i in range(5) for j in range(5) if i < j]
    path = [(4, 10), (10, 11), (11, 12)]
    star = [(12, s) for s in (20, 21, 22)]
    und = clique + path + star
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    out, rounds = core_numbers(edges)
    got = {r["node"]: r["core"] for r in out.collect()}
    assert got == _nx_core(und)
    assert rounds < 20  # local recurrence converges quickly, not O(k_max)
