"""Multivariate family (operators/multivariate.py): numpy pins.

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin the
statistics against full-precision numpy linear algebra on the raw parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_mahalanobis_matches_numpy(spark):
    out = load_all()["mahalanobis_outliers"].spark(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    X = np.column_stack([
        np.round(li["l_quantity"].astype(float), 2),
        np.round(li["l_extendedprice"].astype(float), 2),
        np.round(li["l_discount"].astype(float), 2),
    ])
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", X - mu, inv, X - mu)
    li = li.assign(d2=np.round(d2, 6))
    ref = li.sort_values(
        ["d2", "l_orderkey", "l_linenumber"], ascending=[False, True, True]
    ).head(len(out))
    got = out[["l_orderkey", "l_linenumber"]].to_numpy().tolist()
    exp = ref[["l_orderkey", "l_linenumber"]].to_numpy().tolist()
    assert got == exp
    assert np.allclose(out["maha_sq"].to_numpy(), ref["d2"].to_numpy(), atol=1e-4)


def test_mahalanobis_in_sample_mean_identity(spark):
    """In-sample Mahalanobis with ddof=1 covariance satisfies
    mean(d^2) = p(n-1)/n exactly — a distribution-free sanity identity."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    X = np.column_stack([
        np.round(li["l_quantity"].astype(float), 2),
        np.round(li["l_extendedprice"].astype(float), 2),
        np.round(li["l_discount"].astype(float), 2),
    ])
    mu, inv = X.mean(axis=0), np.linalg.inv(np.cov(X, rowvar=False, ddof=1))
    d2 = np.einsum("ij,jk,ik->i", X - mu, inv, X - mu)
    n = len(X)
    assert abs(d2.mean() - 3 * (n - 1) / n) < 1e-9


def test_pca_matches_numpy_eigh(spark):
    out = load_all()["pca_user_activity"].spark(spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    per = ev.pivot_table(index="user_id", columns="event_type",
                         values="event_id", aggfunc="count", fill_value=0)
    x = np.round(np.log1p(per.get("click", 0).to_numpy(dtype=float)), 9)
    y = np.round(np.log1p(per.get("view", 0).to_numpy(dtype=float)), 9)
    cov = np.cov(np.column_stack([x, y]), rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)  # ascending
    l1, l2 = w[1], w[0]
    pc1 = v[:, 1]
    if pc1[0] < 0 or (pc1[0] == 0 and pc1[1] < 0):
        pc1 = -pc1
    assert out["n_users"] == len(per)
    assert abs(out["var_x"] - cov[0, 0]) < 1e-6
    assert abs(out["cov_xy"] - cov[0, 1]) < 1e-6
    assert abs(out["lambda1"] - l1) < 1e-6
    assert abs(out["lambda2"] - l2) < 1e-6
    assert abs(out["var_explained_pc1"] - l1 / (l1 + l2)) < 1e-6
    assert abs(out["loading_x"] - pc1[0]) < 1e-5
    assert abs(out["loading_y"] - pc1[1]) < 1e-5
