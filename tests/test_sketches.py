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
