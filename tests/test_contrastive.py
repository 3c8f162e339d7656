"""Contrastive-pair mining (operators/contrastive.py).

Oracle parity runs in the driver gate; these pin mining quality against the
exact (brute-force) answer and the role semantics.
"""

from __future__ import annotations

import numpy as np

from serene_spark.operators.contrastive import N_ANCHORS, NEG_K
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = np.stack(emb["embedding"].to_numpy())
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vecs @ vecs.T
    return emb, sims


def test_roles_and_labels_consistent(spark):
    out = load_all()["contrastive_pairs"].spark(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    for _, r in out.iterrows():
        same = labels[r["anchor_id"]] == labels[r["pair_id"]]
        assert (r["role"] == "positive") == same
    # no (anchor, pair) row may appear twice — the probe masks are unique
    assert not out.duplicated(subset=["anchor_id", "pair_id"]).any()
    # every anchor that surfaced has at most 1 positive and <= NEG_K negatives
    counts = out.groupby(["anchor_id", "role"]).size()
    for (_a, role), c in counts.items():
        assert c <= (1 if role == "positive" else NEG_K)


def test_negative_recall_vs_bruteforce(spark):
    """Bucketed mining must recover most of the TRUE hardest negatives —
    the recall property the ANN substrate is trusted for."""
    out = load_all()["contrastive_pairs"].spark(spark, SF).toPandas()
    emb, sims = _exact(spark)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    pos = {v: i for i, v in enumerate(ids)}
    hits = tot = 0
    for a in range(N_ANCHORS):
        if a not in pos:
            continue
        ai = pos[a]
        mask = (labels != labels[ai]) & (ids != a)
        order = np.argsort(-sims[ai][mask])
        true_top = set(ids[mask][order[:NEG_K]])
        got = set(out[(out.anchor_id == a) & (out.role == "negative")]["pair_id"])
        hits += len(true_top & got)
        tot += len(true_top)
    assert tot > 0
    assert hits / tot >= 0.6, (hits, tot)  # multiprobe recall floor


def test_mined_negatives_are_hard(spark):
    """Mined negatives must be harder (more similar) than the cross-label
    average — the point of hard-negative mining."""
    out = load_all()["contrastive_pairs"].spark(spark, SF).toPandas()
    emb, sims = _exact(spark)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    cross = sims[labels[:, None] != labels[None, :]]
    mean_cross = float(cross.mean())
    negs = out[out.role == "negative"]["cosine"]
    assert negs.mean() > mean_cross + 0.05
