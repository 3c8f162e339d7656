"""Error-bound and merge-invariant pins for the sketch operators.

These have no SQL oracles (sketch states are engine-specific); correctness
is defined by (a) bounded error against the exact baselines and (b) the
lossless-union property of same-precision HLL sketches.
"""

from __future__ import annotations

from serene_spark.catalog import register_views
from serene_spark.operators.sketches import (
    APPROX_DISTINCT_SQL,
    APPROX_QUANTILES_SQL,
    HLL_ROLLUP_SQL,
)


def _exact_users(spark):
    return {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY event_type"
        ).collect()
    }


def test_approx_distinct_within_hll_error(spark, sf_dir):
    register_views(spark, sf_dir, ("events",))
    exact = _exact_users(spark)
    got = {r["event_type"]: r["approx_users"] for r in spark.sql(APPROX_DISTINCT_SQL).collect()}
    assert set(got) == set(exact)
    for et, approx in got.items():
        # default approx_count_distinct rsd = 5%; allow 4 sigma
        assert abs(approx - exact[et]) <= max(2, 0.2 * exact[et]), (et, approx, exact[et])


def test_hll_rollup_union_is_lossless(spark, sf_dir):
    """Unioning the daily sketches must give the IDENTICAL estimate to one
    direct sketch over all rows — register-wise union of same-precision HLL
    is exact over sketch state, which is what makes persisted-sketch rollups
    trustworthy."""
    register_views(spark, sf_dir, ("events",))
    rolled = {r["event_type"]: r["approx_users"] for r in spark.sql(HLL_ROLLUP_SQL).collect()}
    direct = {
        r["event_type"]: r["e"]
        for r in spark.sql(
            "SELECT event_type, CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS BIGINT) AS e "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    assert rolled == direct
    exact = _exact_users(spark)
    for et, approx in rolled.items():
        # default lgConfigK=12 -> relative error ~1.6%; generous bound
        assert abs(approx - exact[et]) <= max(2, 0.1 * exact[et]), (et, approx, exact[et])


def test_approx_quantiles_rank_error(spark, sf_dir):
    """Each reported quantile's true rank must be within 1% of the target
    fraction (accuracy=10000 guarantees 0.01%; 1% absorbs duplicate-value
    rank plateaus)."""
    register_views(spark, sf_dir, ("events",))
    rows = spark.sql(APPROX_QUANTILES_SQL).collect()
    assert rows
    values = {}
    for r in spark.sql("SELECT event_type, value FROM events").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        vs = sorted(values[r["event_type"]])
        n = len(vs)
        for frac, col in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")):
            q = r[col]
            lo = sum(1 for v in vs if v < q - 5e-7) / n       # rank below
            hi = sum(1 for v in vs if v <= q + 5e-7) / n      # rank at-or-below
            assert lo - 0.01 <= frac <= hi + 0.01, (r["event_type"], col, q, lo, hi)


def _kmv_python_reference(sf_dir: str, k: int):
    """Independent KMV implementation: hashlib md5 over user-day keys."""
    import hashlib

    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = ev["ts"]
    if ts.dtype.kind in "iu":  # raw nanos regeneration
        secs = ts // 1_000_000_000
    else:  # datetime64 at whatever unit pandas picked: truncate to seconds
        secs = ts.astype("datetime64[s]").astype("int64")
    keys = ev["user_id"].astype("int64").astype(str) + "|" + (secs // 86400).astype(str)
    by_type: dict[str, set] = {}
    for t, key in zip(ev["event_type"], keys):
        by_type.setdefault(t, set()).add(key)

    def u_of(key: str) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
        return (h + 0.5) / 2**52

    sketches = {
        t: sorted(u_of(key) for key in ks)[:k] for t, ks in by_type.items()
    }
    return by_type, sketches


def test_kmv_ndv_matches_python_reference(spark, sf_dir):
    from serene_spark.operators.sketches import KMV_K
    from serene_spark.registry import load_all

    got = load_all()["kmv_ndv_users"].spark(spark, sf_dir).toPandas()
    by_type, sketches = _kmv_python_reference(sf_dir, KMV_K)
    for _, row in got.iterrows():
        sk = sketches[row.event_type]
        assert row.ndv_exact == len(by_type[row.event_type])
        assert row.sketch_size == min(KMV_K, len(by_type[row.event_type]))
        est = len(sk) if len(sk) < KMV_K else (KMV_K - 1) / sk[-1]
        assert abs(row.ndv_est - round(est, 6)) <= 1e-6
        # below K the sketch IS the set: estimator exact
        if len(by_type[row.event_type]) < KMV_K:
            assert row.ndv_est == row.ndv_exact
        # sketch-paper error band, generous: P(rel err > 4/sqrt(K-2)) tiny
        assert row.rel_err <= 4.0 / (KMV_K - 2) ** 0.5


def test_kmv_set_ops_matches_python_reference(spark, sf_dir):
    from serene_spark.operators.sketches import KMV_K
    from serene_spark.registry import load_all

    got = load_all()["kmv_set_ops_users"].spark(spark, sf_dir).toPandas()
    by_type, sketches = _kmv_python_reference(sf_dir, KMV_K)
    for _, row in got.iterrows():
        sa, sb = set(sketches[row.type_a]), set(sketches[row.type_b])
        merged = sorted(sa | sb)[:KMV_K]
        c = len(merged)
        union_est = c if c < KMV_K else (KMV_K - 1) / merged[-1]
        common = sum(1 for u in merged if u in sa and u in sb)
        jacc = common / c
        assert abs(row.union_est - round(union_est, 6)) <= 1e-6
        assert abs(row.jaccard_est - round(jacc, 6)) <= 1e-6
        assert abs(row.inter_est - round(jacc * union_est, 6)) <= 1e-6
        # exact audit columns reconcile with raw sets
        a, b = by_type[row.type_a], by_type[row.type_b]
        assert row.union_exact == len(a | b)
        assert row.inter_exact == len(a & b)
        # the estimate brackets truth within the generous band
        if len(a | b) >= KMV_K:
            assert abs(row.union_est - row.union_exact) / row.union_exact <= 0.35
            assert abs(row.jaccard_est - row.jaccard_exact) <= 0.15


def test_kmv_rollup_merge_lemma_and_python_reference(spark, sf_dir):
    """Daily-partial rollup == direct sketch (the merge lemma), checked
    in-query and re-derived independently in python."""
    from serene_spark.operators.sketches import KMV_K
    from serene_spark.registry import load_all

    got = load_all()["kmv_rollup_users"].spark(spark, sf_dir).toPandas()
    assert (got.rollup_equal == 1).all()
    _, sketches = _kmv_python_reference(sf_dir, KMV_K)
    for _, row in got.iterrows():
        sk = sketches[row.event_type]
        est = len(sk) if len(sk) < KMV_K else (KMV_K - 1) / sk[-1]
        assert abs(row.ndv_est_direct - round(est, 6)) <= 1e-6
        assert abs(row.ndv_est_rollup - round(est, 6)) <= 1e-6


def test_quantile_sketch_merge_lemma_and_python_reference(spark, sf_dir):
    """The bottom-K coordinated sample must (a) reproduce exactly from an
    independent python re-derivation of the row hashes, (b) obey the
    merge lemma — bottom-K of the union of two half-corpus bottom-Ks ==
    the global bottom-K sample — and (c) keep the realized rank error of
    every estimate inside the binomial bound the docstring promises."""
    import hashlib

    import pandas as pd

    from serene_spark.operators.sketches import QSK_K
    from serene_spark.registry import load_all

    got = load_all()["quantile_sketch_bottomk"].spark(spark, sf_dir).toPandas()

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["v"] = ev.value.round(2)
    ev["u"] = ev.event_id.map(
        lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 0.5)
        / 2**52
    )

    def bottom_k(df):
        return df.sort_values("u").groupby("event_type", sort=False).head(QSK_K)

    def est_p(sample, p):
        out = {}
        for t, g in sample.groupby("event_type"):
            vs = g.v.sort_values().to_numpy()
            import math
            out[t] = float(vs[math.ceil(p * len(vs)) - 1])
        return out

    full_sample = bottom_k(ev)
    for p, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        ref = est_p(full_sample, p)
        for _, row in got.iterrows():
            assert abs(row[col] - ref[row.event_type]) < 1e-9, (col, row.event_type)

    # merge lemma: two half-corpus partial sketches merge to the global one
    half_a = bottom_k(ev[ev.event_id % 2 == 0])
    half_b = bottom_k(ev[ev.event_id % 2 == 1])
    merged = bottom_k(pd.concat([half_a, half_b]))
    pd.testing.assert_frame_equal(
        merged.sort_values(["event_type", "u"]).reset_index(drop=True)[
            ["event_type", "v", "u"]
        ],
        full_sample.sort_values(["event_type", "u"]).reset_index(drop=True)[
            ["event_type", "v", "u"]
        ],
    )

    # realized rank error: each estimate's true rank within 5 sigma of p
    import math

    for p, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        sigma = math.sqrt(p * (1 - p) / QSK_K)
        for _, row in got.iterrows():
            g = ev[ev.event_type == row.event_type]
            rank = (g.v <= row[col] + 1e-12).mean()
            assert abs(rank - p) < 5 * sigma + 2.0 / QSK_K, (col, row.event_type, rank)


def test_quantile_rollup_equals_direct_everywhere(spark, sf_dir):
    """The rollup query's own equality flag must be 1 for every type (the
    merge lemma made executable), and the rolled-up estimates must equal
    the standalone quantile_sketch_bottomk's."""
    from serene_spark.registry import load_all

    qs = load_all()
    roll = {r.event_type: r for r in
            qs["quantile_sketch_rollup"].spark(spark, sf_dir).collect()}
    assert all(r.rollup_equals_direct == 1 for r in roll.values())
    base = {r.event_type: r for r in
            qs["quantile_sketch_bottomk"].spark(spark, sf_dir).collect()}
    assert set(roll) == set(base)
    for t in roll:
        assert roll[t].p50_rollup == base[t].p50_est, t
        assert roll[t].p90_rollup == base[t].p90_est, t
        assert roll[t].p99_rollup == base[t].p99_est, t
