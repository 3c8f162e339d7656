"""Pins for the optimizer-stats / layout operators (stats.py).

equi_depth_histogram and zorder_manifest are oracle-backed (engine
equivalence via test_oracle_parity); these tests pin the SEMANTICS:
histogram balance, z-order clustering quality, NDV sketch error.
"""

from __future__ import annotations

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB
from serene_spark.operators.stats import (
    HIST_BUCKETS,
    NDV_COLUMNS,
    equi_depth_histogram_sql,
    ndv_sketch_sql,
    zorder_manifest_sql,
)


def test_equi_depth_buckets_are_balanced_and_ordered(duck):
    rows = sorted(duck.execute(equi_depth_histogram_sql(DUCKDB)).fetchall())
    n = sum(r[1] for r in rows)
    assert len(rows) == HIST_BUCKETS
    # equal depth up to tie spill: a bucket can't exceed its fair share
    # by more than the heaviest value's count
    heaviest = duck.execute(
        "SELECT MAX(c) FROM (SELECT COUNT(*) c FROM lineitem GROUP BY l_extendedprice)"
    ).fetchone()[0]
    prev_max = None
    for bucket, n_rows, n_distinct, min_v, max_v in rows:
        assert 0 <= bucket < HIST_BUCKETS
        assert n_rows <= n / HIST_BUCKETS + heaviest
        assert min_v <= max_v
        if prev_max is not None:
            assert min_v >= prev_max  # buckets partition the value axis
        prev_max = max_v
    assert n == duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]


def test_zorder_files_have_tight_bounding_boxes(duck):
    """The point of Z-order: every file's bounding box spans a small part of
    BOTH dimensions, so predicates on either prune most files."""
    rows = duck.execute(zorder_manifest_sql(DUCKDB)).fetchall()
    assert rows
    g_ck_min, g_ck_max, g_d_min, g_d_max = duck.execute(
        "SELECT MIN(min_custkey), MAX(max_custkey), MIN(min_day), MAX(max_day) FROM ("
        + zorder_manifest_sql(DUCKDB) + ")"
    ).fetchone()
    ck_span, d_span = g_ck_max - g_ck_min + 1, g_d_max - g_d_min + 1
    total = sum(r[1] for r in rows)
    assert total == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    # average per-file fractional span on each dimension: Morton buckets
    # cover aligned rectangles, so both must be far below 1 (a custkey-sorted
    # layout would give ~1.0 on the day dimension)
    avg_ck = sum((r[3] - r[2] + 1) / ck_span for r in rows) / len(rows)
    avg_d = sum((r[5] - r[4] + 1) / d_span for r in rows) / len(rows)
    assert avg_ck < 0.25, avg_ck
    assert avg_d < 0.25, avg_d


def test_ndv_sketch_error_bound(spark, sf_dir):
    register_views(spark, sf_dir, ("lineitem",))
    got = {
        r["column_name"]: (r["approx_ndv"], r["n_nulls"], r["n_rows"])
        for r in spark.sql(ndv_sketch_sql("lineitem")).collect()
    }
    assert set(got) == set(NDV_COLUMNS["lineitem"])
    for col in NDV_COLUMNS["lineitem"]:
        exact, nulls = spark.sql(
            f"SELECT COUNT(DISTINCT {col}) AS d, COUNT(*) - COUNT({col}) AS nn FROM lineitem"
        ).collect()[0]
        approx, got_nulls, n_rows = got[col]
        assert got_nulls == nulls  # null counts are exact
        assert abs(approx - exact) <= max(2, 0.15 * exact), (col, approx, exact)


def test_zorder_skip_estimate_shows_both_dim_pruning(spark, sf_dir):
    """The measurement behind the layout claim: z-order prunes BOTH
    dimensions to a small fraction; a single-column sort prunes only its
    own column and scans ~every file for the other."""
    from serene_spark.registry import load_all

    rows = {
        (r["layout"], r["dim"]): float(r["avg_scan_fraction"])
        for r in load_all()["zorder_skip_estimate"].spark(spark, sf_dir).collect()
    }
    assert set(rows) == {
        ("zorder", "custkey"), ("zorder", "day"),
        ("sorted_custkey", "custkey"), ("sorted_custkey", "day"),
    }
    # the sorted layout is near-blind on the non-sorted dimension
    # (0.85 at sf0.001, 0.998 at sf0.01 — approaches 1 as files fill out)
    assert rows[("sorted_custkey", "day")] > 0.75
    # z-order prunes both dimensions far below that
    assert rows[("zorder", "day")] < 0.5 * rows[("sorted_custkey", "day")]
    assert rows[("zorder", "custkey")] < 0.5
    # and the sorted layout is (unsurprisingly) best on its own column
    assert rows[("sorted_custkey", "custkey")] <= rows[("zorder", "custkey")] + 0.05


def test_cbo_audit_properties(spark, sf_dir):
    """FK joins on uniform keys are the case System R estimates EXACTLY
    (|R|*|S|/max(ndv) with ndv = key count); histogram selectivity at
    bucket granularity errs by at most one bucket's rows."""
    from serene_spark.operators.stats import HIST_BUCKETS
    from serene_spark.registry import load_all

    rows = {r["target"]: r
            for r in load_all()["cbo_estimate_audit"].spark(spark, sf_dir).collect()}
    assert rows["join_customer_orders"]["rel_error"] == 0.0
    assert rows["join_orders_lineitem"]["rel_error"] == 0.0
    sel = [r for t, r in rows.items() if t.startswith("sel_price_lt_")][0]
    n_lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    bucket_rows = n_lineitem / HIST_BUCKETS
    assert abs(sel["estimated"] - sel["actual"]) <= bucket_rows + 1


def test_join_key_skew_matches_pandas(spark, sf_dir):
    import numpy as np

    from serene_spark.catalog import load_table
    from serene_spark.operators.stats import SKEW_KEYS
    from serene_spark.registry import load_all

    rows = {r["join_key"]: r
            for r in load_all()["join_key_skew"].spark(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.{c}" for t, c in SKEW_KEYS}
    for table, col in SKEW_KEYS:
        counts = (
            load_table(spark, sf_dir, table).groupBy(col).count().toPandas()["count"]
        )
        r = rows[f"{table}.{col}"]
        assert r["n_keys"] == len(counts)
        assert r["n_rows"] == counts.sum()
        assert r["max_rows_per_key"] == counts.max()
        assert abs(r["mean_rows_per_key"] - round(counts.mean(), 6)) < 1e-6
        # p99 per the count-histogram definition: smallest c with
        # cum_keys(c) >= ceil(0.99 * n_keys)
        vals = np.sort(counts.values)
        cum = np.arange(1, len(vals) + 1)
        p99 = vals[np.argmax(cum >= np.ceil(0.99 * len(vals)))]
        assert r["p99_rows_per_key"] == p99
        assert abs(r["skew_factor"] - round(counts.max() / counts.mean(), 6)) < 1e-5
