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
