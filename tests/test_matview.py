"""Incremental materialized-view maintenance (operators/matview.py).

Oracle parity (incremental == full recompute) runs in the driver gate;
these pin the production two-table flow — a snapshot aggregate MATERIALIZED
to parquet, then merged with delta partials — and the scan shape that makes
the refresh O(delta).
"""

from __future__ import annotations

import re

from serene_spark.catalog import load_table
from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.matview import (
    SPLIT_TS,
    matview_recompute_sql,
    merge_with_stored_sql,
    snapshot_partials_sql,
)

SF = "/root/testdata/sf0.001"


def _normalize(df):
    import pandas as pd

    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_stored_snapshot_merge_equals_recompute(spark, tmp_path):
    """Materialize the snapshot aggregate to parquet (the stored view
    table), merge with delta partials, and assert equality with a full
    recompute — the maintenance identity over the REAL two-table flow."""
    load_table(spark, SF, "events").createOrReplaceTempView("events")
    snap_path = str(tmp_path / "snap_stored")
    spark.sql(snapshot_partials_sql(SPARK)).write.parquet(snap_path)
    spark.read.parquet(snap_path).createOrReplaceTempView("snap_stored")

    merged = _normalize(spark.sql(merge_with_stored_sql(SPARK)))
    full = _normalize(spark.sql(matview_recompute_sql(SPARK)))
    assert merged.shape == full.shape
    assert (merged.values == full.values).all()
    spark.catalog.dropTempView("snap_stored")
    spark.catalog.dropTempView("events")


def test_refresh_scans_events_once_with_delta_filter_pushed(spark, tmp_path):
    """The refresh must scan events exactly once (the delta side) with the
    ts >= SPLIT predicate pushed to the scan — at scale, partition pruning
    makes the refresh cost O(new data)."""
    load_table(spark, SF, "events").createOrReplaceTempView("events")
    snap_path = str(tmp_path / "snap_stored2")
    spark.sql(snapshot_partials_sql(SPARK)).write.parquet(snap_path)
    spark.read.parquet(snap_path).createOrReplaceTempView("snap_stored")

    plan = spark.sql(merge_with_stored_sql(SPARK))._jdf.queryExecution().executedPlan().toString()
    event_scans = len(re.findall(r"FileScan parquet[^\n]*events\.parquet", plan))
    assert event_scans == 1, plan
    scan_line = re.search(r"FileScan parquet[^\n]*events\.parquet[^\n]*", plan).group(0)
    # the ts predicate must appear ON THE SCAN LINE (PushedFilters) — a
    # whole-plan match would also accept a post-scan Filter node, which is
    # exactly the non-pushed shape this test exists to reject
    assert "GreaterThanOrEqual(ts" in scan_line, scan_line
    spark.catalog.dropTempView("snap_stored")
    spark.catalog.dropTempView("events")


def test_snapshot_only_and_delta_only_groups_pass_through(spark, tmp_path):
    """A group absent from the delta must appear unchanged from the
    snapshot, and a brand-new delta group must appear — the two edge arms
    of the FULL OUTER merge."""
    load_table(spark, SF, "events").createOrReplaceTempView("events")
    snap_path = str(tmp_path / "snap_stored3")
    spark.sql(snapshot_partials_sql(SPARK)).write.parquet(snap_path)
    snap = spark.read.parquet(snap_path)
    snap.createOrReplaceTempView("snap_stored")

    merged = spark.sql(merge_with_stored_sql(SPARK))
    delta_hours = {
        r[0]
        for r in spark.sql(
            f"SELECT DISTINCT CAST(unix_micros(ts) DIV 3600000000 AS BIGINT) "
            f"FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}'"
        ).collect()
    }
    snap_rows = {(r["hour_bucket"], r["event_type"]): r for r in snap.collect()}
    for row in merged.collect():
        key = (row["hour_bucket"], row["event_type"])
        if row["hour_bucket"] not in delta_hours:
            s = snap_rows[key]
            assert row["n_events"] == s["n_events"]
            assert float(row["min_value"]) == float(s["min_value"])
        elif key not in snap_rows:
            assert row["n_events"] >= 1  # delta-only group surfaced
    spark.catalog.dropTempView("snap_stored")
    spark.catalog.dropTempView("events")
