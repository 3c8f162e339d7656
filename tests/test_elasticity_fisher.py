"""Grouped elasticity + embedding Fisher audit: numpy pins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_elasticity_matches_numpy(spark):
    out = load_all()["elasticity_loglog_parts"].spark(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF}/part.parquet")
    df = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    df["x"] = np.round(
        np.log(df.l_extendedprice.astype(float) / df.l_quantity.astype(float)), 9
    )
    df["y"] = np.round(np.log(df.l_quantity.astype(float)), 9)
    for _, r in out.iterrows():
        g = df[df.p_type == r["p_type"]]
        slope, intercept = np.polyfit(g.x, g.y, 1)
        rr = np.corrcoef(g.x, g.y)[0, 1] ** 2
        assert r["n"] == len(g)
        assert abs(r["elasticity"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-4
        assert abs(r["r2"] - rr) < 1e-4


def test_fisher_matches_scipy_style_anova(spark):
    out = load_all()["embedding_fisher_ratio"].spark(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1e6)
    labels = emb.label.to_numpy()
    classes = np.unique(labels)
    n, _ = X.shape
    fs = {}
    for d in range(X.shape[1]):
        x = X[:, d]
        grand = x.mean()
        ssb = sum(
            (labels == c).sum() * (x[labels == c].mean() - grand) ** 2
            for c in classes
        )
        ssw = sum(((x[labels == c] - x[labels == c].mean()) ** 2).sum() for c in classes)
        fs[d + 1] = (ssb / (len(classes) - 1)) / (ssw / (n - len(classes)))
    ranked = sorted(fs.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    for row, (dim, f) in zip(out.itertuples(), ranked):
        assert row.dim == dim
        assert abs(row.fisher_f - f) < 1e-3
        assert row.n_classes == len(classes)
