"""Integer-exact k-means (operators/clustering.py).

Oracle parity (Spark == DuckDB) runs in the driver gate; this pins the
whole trajectory — quantization, assignments, centroid updates, inertia —
against an independent numpy implementation of the same integer recurrence.
"""

from __future__ import annotations

import math

import numpy as np

from serene_spark.operators.clustering import DIM, K, N_ITER, SCALE
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _reference(spark):
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    # quantize exactly like the SQL: floor(double(x) * 1e6)
    xq = np.array(
        [[math.floor(float(v) * SCALE) for v in r["embedding"]] for r in rows],
        dtype=np.int64,
    )
    cm = xq[:K].copy()  # init: K lowest vec_ids
    assign = np.zeros(len(rows), dtype=np.int64)
    dists = np.zeros(len(rows), dtype=np.int64)
    inertia_per_iter = []
    for _ in range(N_ITER):
        d2 = ((xq[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest cid, same as SQL
        dists = d2[np.arange(len(rows)), assign]
        inertia_per_iter.append(int(dists.sum()))
        for c in range(K):
            pts = xq[assign == c]
            if len(pts):
                s = pts.sum(axis=0)
                # truncate-toward-zero division
                cm[c] = np.sign(s) * (np.abs(s) // len(pts))
    return cm, assign, dists, inertia_per_iter


def test_kmeans_matches_numpy_reference(spark):
    cm, assign, dists, inertia_per_iter = _reference(spark)
    rows = load_all()["kmeans_embeddings"].spark(spark, SF).collect()
    assert len(rows) == K * DIM
    for r in rows:
        assert r["centroid_micro"] == cm[r["cid"], r["d"] - 1]
        assert r["n_points"] == int((assign == r["cid"]).sum())
        exp_inertia = round(dists[assign == r["cid"]].sum() / (SCALE * SCALE), 6)
        assert abs(r["inertia"] - exp_inertia) < 1e-6
    # structural: every cluster id present; Lloyd monotonicity held across
    # the quantized iterations (quantization error could break it in theory
    # — this pins that it doesn't on this corpus)
    assert {r["cid"] for r in rows} == set(range(K))
    assert inertia_per_iter == sorted(inertia_per_iter, reverse=True)


def test_kmeans_converged_truncation_equals_unrolled(spark):
    """Stopping the convergence loop at N_ITER rounds must reproduce the
    unrolled oracle query exactly — same recurrence by construction."""
    from serene_spark.operators.clustering import kmeans_converged

    qs = load_all()
    unrolled = sorted(map(tuple, qs["kmeans_embeddings"].spark(spark, SF).collect()))
    out, n_iter = kmeans_converged(spark, SF, max_iter=N_ITER)
    assert n_iter == N_ITER
    assert sorted(map(tuple, out.collect())) == unrolled


def test_kmeans_converged_fixed_point_matches_numpy(spark):
    from serene_spark.operators.clustering import kmeans_converged

    # numpy run of the same integer recurrence to assignment stability
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    xq = np.array(
        [[math.floor(float(v) * SCALE) for v in r["embedding"]] for r in rows],
        dtype=np.int64,
    )
    cm = xq[:K].copy()
    assign = None
    for _ in range(200):
        d2 = ((xq[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        new_assign = d2.argmin(axis=1)
        for c in range(K):
            pts = xq[new_assign == c]
            if len(pts):
                s = pts.sum(axis=0)
                cm[c] = np.sign(s) * (np.abs(s) // len(pts))
        if assign is not None and (new_assign == assign).all():
            break
        assign = new_assign

    out, n_iter = kmeans_converged(spark, SF)
    got = {(r["cid"], r["d"]): r["centroid_micro"] for r in out.collect()}
    for c in range(K):
        for d in range(DIM):
            assert got[(c, d + 1)] == cm[c, d]
    assert n_iter < 60  # actually converged, not max-iter-stopped


def test_kmeans_quality_matches_numpy(spark):
    """Cohesion/separation recomputed independently with numpy integers
    against the FINAL centroids."""
    cm, _, _, _ = _reference(spark)
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    xq = np.array(
        [[math.floor(float(v) * SCALE) for v in r["embedding"]] for r in rows],
        dtype=np.int64,
    )
    d2 = ((xq[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    dists = d2[np.arange(len(rows)), assign]
    cd = ((cm[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2).astype(float)
    np.fill_diagonal(cd, np.inf)

    out = load_all()["kmeans_cluster_quality"].spark(spark, SF).collect()
    assert {r["cid"] for r in out} == set(np.unique(assign))
    for r in out:
        c = r["cid"]
        pts = dists[assign == c]
        assert r["n_points"] == len(pts)
        mean_within = pts.sum() / len(pts)
        assert abs(float(r["mean_within_dist"]) - round(mean_within / SCALE**2, 6)) < 1e-5
        nearest = cd[c].min()
        assert abs(float(r["nearest_centroid_dist"]) - round(nearest / SCALE**2, 6)) < 1e-5
        assert abs(float(r["separation_ratio"]) - round(nearest / mean_within, 6)) < 1e-4
