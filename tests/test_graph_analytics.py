"""Graph analytics (operators/graph_analytics.py).

Triangle parity (Spark == DuckDB) runs in the driver gate; these pin the
counts against an independent python reference and pin the large-star CC
labels/round-count properties the rows-only gate cannot see.
"""

from __future__ import annotations

from itertools import combinations

from serene_spark.operators.graph_analytics import large_star_cc
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _copurchase_edges(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    cs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_suppkey"]
        ].drop_duplicates()
    )
    pairs = cs.merge(cs, on="o_custkey")
    return {
        frozenset((a, b))
        for a, b in zip(pairs["l_suppkey_x"], pairs["l_suppkey_y"])
        if a != b
    }


def test_triangle_counts_match_python(spark):
    edges = _copurchase_edges(spark)
    adj: dict[int, set[int]] = {}
    for e in edges:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_per_node: dict[int, int] = {}
    total = 0
    for node, nbrs in adj.items():
        # count triangles at their min-id vertex to count each once
        for x, y in combinations(sorted(nbrs), 2):
            if node < x and y in adj[x]:
                total += 1
                for v in (node, x, y):
                    tri_per_node[v] = tri_per_node.get(v, 0) + 1

    rows = load_all()["triangle_counts"].spark(spark, SF).collect()
    assert rows
    assert all(r["total_triangles"] == total for r in rows)
    expected_top = sorted(
        tri_per_node.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(rows)]
    got = sorted(rows, key=lambda r: (-r["n_triangles"], r["s_suppkey"]))
    for (exp_node, exp_n), r in zip(expected_top, got):
        assert (r["s_suppkey"], r["n_triangles"]) == (exp_node, exp_n)
        assert r["degree"] == len(adj[exp_node])


def test_cc_large_star_equals_min_label(spark):
    """Same labels as dedup_clusters (both use the component min as id)."""
    qs = load_all()
    min_label = {
        r["doc_id"]: r["cluster"] for r in qs["dedup_clusters"].spark(spark, SF).collect()
    }
    star = {
        r["doc_id"]: r["cluster"] for r in qs["cc_large_star"].spark(spark, SF).collect()
    }
    assert star == min_label
    assert star  # non-empty: the corpus has verified near-dup pairs


def test_large_star_logarithmic_on_deep_path(spark):
    """A 128-node path: min-label one-hop needs 127 rounds; star rewriting
    must finish in O(log n) — the property that makes it the scale sibling."""
    n = 128
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "lo long, hi long"
    )
    labels_df, rounds = large_star_cc(edges)
    labels = {r["doc_id"]: r["cluster"] for r in labels_df.collect()}
    assert labels == {i: 0 for i in range(n)}
    assert rounds <= 12  # ~2·log2(128) + slack, far below the 127 of one-hop


def test_large_star_multi_component(spark):
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (30, 33)],
        "lo long, hi long",
    )
    labels_df, _ = large_star_cc(edges)
    labels = {r["doc_id"]: r["cluster"] for r in labels_df.collect()}
    assert labels == {
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }
