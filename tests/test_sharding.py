"""Consistent-hash rebalance audit against an exact python ring."""

from __future__ import annotations

import hashlib

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _u32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def test_rebalance_matches_python_ring(spark):
    from serene_spark.operators.sharding import (
        MOD_THEORETICAL_MOVED,
        RING,
        S_NEW,
        S_OLD,
        VNODES,
    )

    out = load_all()["consistent_hash_rebalance"].spark(spark, SF).toPandas()
    keys = [
        int(k)
        for k in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey")
        .toPandas()
        .o_orderkey
    ]
    vn = {
        (s, v): _u32(f"shard-{s}:{v}")
        for s in range(S_NEW)
        for v in range(VNODES)
    }

    def assign(h: int, n_shards: int) -> int:
        best = min(
            ((vh - h + RING) % RING, s * VNODES + v)
            for (s, v), vh in vn.items()
            if s < n_shards
        )
        return best[1] // VNODES

    mod_moved = ring_moved = 0
    for k in keys:
        h = _u32(str(k))
        mod_moved += (h % S_OLD) != (h % S_NEW)
        ring_moved += assign(h, S_OLD) != assign(h, S_NEW)

    got = {r.strategy: r for r in out.itertuples()}
    assert got["mod"].n_keys == got["ring"].n_keys == len(keys)
    assert got["mod"].n_moved == mod_moved
    assert got["ring"].n_moved == ring_moved
    assert abs(got["mod"].theoretical_frac - round(MOD_THEORETICAL_MOVED, 6)) < 1e-9
    assert got["ring"].theoretical_frac == round(1 - S_OLD / S_NEW, 6)
    # the point of the operator: ring moves ~1/5 of keys, mod ~4/5 — the
    # measured gap must be decisive, not marginal
    assert got["ring"].moved_frac < 0.35
    assert got["mod"].moved_frac > 0.65
    assert got["mod"].moved_frac > 2 * got["ring"].moved_frac
