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


def test_retractable_agg_constructed_changelog(spark):
    """Signed-delta maintenance pinned on a hand-built I/U/D sequence,
    and the delta formulation must equal the recompute formulation on
    the SAME engine (the identity parity proves cross-engine)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.matview import (
        retractable_delta_sql,
        retractable_recompute_sql,
    )

    t0 = datetime.datetime(2024, 5, 1)

    def ev(eid, minutes, user, etype, value):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user, etype, value, "{}")

    rows = [
        # user 1: insert 10, update to 25 -> live 25
        ev(1, 0, 1, "signup", 10.0),
        ev(2, 5, 1, "click", 25.0),
        # user 2: insert 50, delete -> dead
        ev(3, 0, 2, "signup", 50.0),
        ev(4, 9, 2, "error", None),
        # user 3: update-only key (no insert seen) 7 -> live 7
        ev(5, 3, 3, "view", 7.0),
        # user 4: insert, delete, re-insert 40 -> live 40
        ev(6, 0, 4, "signup", 5.0),
        ev(7, 2, 4, "error", None),
        ev(8, 4, 4, "signup", 40.0),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(df).createOrReplaceTempView("events")
    [inc] = spark.sql(retractable_delta_sql(SPARK_D)).collect()
    [rec] = spark.sql(retractable_recompute_sql(SPARK_D)).collect()
    spark.catalog.dropTempView("events")
    assert inc == rec  # same-engine identity, full row
    assert inc["n_live"] == 3
    assert abs(inc["total_value"] - (25.0 + 7.0 + 40.0)) < 1e-9
    assert inc["n_ops"] == 8
    assert inc["n_inserts"] == 4 and inc["n_updates"] == 2 and inc["n_deletes"] == 2


def test_retractable_agg_corpus_identity(spark):
    """On the real corpus the two formulations agree row-for-row on the
    same engine (the driver's parity proves it cross-engine)."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.matview import (
        retractable_delta_sql,
        retractable_recompute_sql,
    )

    register_views(spark, "/root/testdata/sf0.001", ("events",))
    [inc] = spark.sql(retractable_delta_sql(SPARK_D)).collect()
    [rec] = spark.sql(retractable_recompute_sql(SPARK_D)).collect()
    assert inc == rec
    assert inc["n_live"] > 0 and inc["n_deletes"] > 0  # both paths exercised
