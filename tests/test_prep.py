"""Data-prep operators (operators/prep.py).

Oracle parity runs in the driver gate; these pin the semantics against
independent pandas/python computations and the structural invariants.
"""

from __future__ import annotations

import numpy as np

from serene_spark.operators.prep import COMPACT_TARGET, EWMA_WINDOW
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_ewma_matches_pandas(spark):
    from serene_spark.catalog import load_table

    out = load_all()["ts_ewma_hourly"].spark(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["hour_bucket"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // (3600 * 1_000_000)
    )
    hourly = ev.groupby(["event_type", "hour_bucket"]).size().rename("cnt").reset_index()
    checked = 0
    for et, grp in hourly.groupby("event_type"):
        grp = grp.sort_values("hour_bucket").reset_index(drop=True)
        for i in range(len(grp)):
            h = grp["hour_bucket"][i]
            w = grp[(grp["hour_bucket"] >= h - EWMA_WINDOW) & (grp["hour_bucket"] <= h)]
            wts = np.round(0.30 * (0.70 ** (h - w["hour_bucket"])), 9)
            ref = float((wts * w["cnt"]).sum() / wts.sum())
            row = out[(out.event_type == et) & (out.hour_bucket == h)]
            assert len(row) == 1
            assert abs(row.iloc[0]["ewma"] - ref) < 1e-4
            checked += 1
    assert checked == len(out)


def test_winsorize_bounds_and_order_preserved(spark):
    out = load_all()["winsorize_events"].spark(spark, SF).toPandas()
    for et, grp in out.groupby("event_type"):
        lo = grp[grp.clamped == 0]["value_winsorized"].min()
        hi = grp[grp.clamped == 0]["value_winsorized"].max()
        # clamped rows land exactly on the surviving range's edge
        assert (grp["value_winsorized"] >= lo - 1e-9).all()
        assert (grp["value_winsorized"] <= hi + 1e-9).all()
        # ~2% of rows clamp (p01 + p99 tails)
        assert 0.0 < grp["clamped"].mean() < 0.1
        # unclamped rows unchanged
        ok = grp[grp.clamped == 0]
        assert (ok["value"] == ok["value_winsorized"]).all()


def test_group_split_is_leakage_safe_and_covering(spark):
    out = load_all()["group_split_documents"].spark(spark, SF).toPandas()
    # every source maps to exactly one split — the leakage guard
    per_source = out.groupby("source")["split"].nunique()
    assert (per_source == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert "train" in set(out["split"])
    # every document assigned
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs


def test_compaction_plan_bins_are_target_sized(spark):
    out = load_all()["compaction_plan"].spark(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    # conservation: every byte lands in exactly one bin
    assert out["total_bytes"].sum() == docs["n_chars"].sum()
    assert out["n_files"].sum() == len(docs)
    # every non-final bin per source is filled to >= the target (its first
    # file crossed the boundary) and no bin exceeds target + max file size
    max_file = docs["n_chars"].max()
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("bin_id")
        for b in grp["total_bytes"].iloc[:-1]:
            assert b + max_file >= COMPACT_TARGET
        assert (grp["total_bytes"] <= COMPACT_TARGET + max_file).all()


def test_split_leakage_audit(spark, sf_dir):
    from serene_spark.registry import load_all

    qs = load_all()
    rows = qs["split_leakage_audit"].spark(spark, sf_dir).collect()
    # complete 6-pair spine, leakage flag = cross-split
    assert {(r["split_a"], r["split_b"]) for r in rows} == {
        ("test", "test"), ("test", "train"), ("test", "val"),
        ("train", "train"), ("train", "val"), ("val", "val"),
    }
    for r in rows:
        assert r["is_leakage"] == int(r["split_a"] != r["split_b"])
        assert (r["n_pairs"] == 0) == (r["max_jaccard"] == 0.0)
    # accounting: every verified pair lands in exactly one spine cell
    n_pairs = qs["dedup_lsh_verified"].spark(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs > 0
