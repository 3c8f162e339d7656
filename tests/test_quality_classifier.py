"""Accuracy and determinism pins for the distilled quality classifier."""

from __future__ import annotations

from serene_spark.ml.quality_classifier import (
    HOLDOUT_MOD,
    train_quality_model,
    quality_classifier_score,
)


def test_holdout_accuracy_and_score_surface(spark, sf_dir):
    model, holdout = train_quality_model(spark, sf_dir)
    scored = model.transform(holdout)
    rows = scored.select("doc_id", "quality_pass", "prediction").collect()
    assert rows
    acc = sum(1 for r in rows if r["prediction"] == r["quality_pass"]) / len(rows)
    # the gate is an axis-aligned threshold rule of the input features —
    # the forest must recover it almost exactly on unseen docs
    assert acc >= 0.9, acc

    out = quality_classifier_score(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs
    for r in out:
        assert 0.0 <= r["prob_good"] <= 1.0
        assert r["pred"] in (0, 1)
    # prob_good must actually separate the classes in aggregate
    pos = [r["prob_good"] for r in out if r["rule_label"] == 1]
    neg = [r["prob_good"] for r in out if r["rule_label"] == 0]
    if pos and neg:
        assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2


def test_training_is_deterministic(spark, sf_dir):
    a = {
        (r["doc_id"], r["prob_good"], r["pred"])
        for r in quality_classifier_score(spark, sf_dir).collect()
    }
    b = {
        (r["doc_id"], r["prob_good"], r["pred"])
        for r in quality_classifier_score(spark, sf_dir).collect()
    }
    assert a == b


def test_quality_calibration_diagram(spark, sf_dir):
    """Bin accounting + the property the diagram exists to check: actual
    pass rate increases with predicted probability across populated bins."""
    from serene_spark.ml.quality_classifier import N_CALIB_BINS
    from serene_spark.registry import load_all

    qs = load_all()
    rows = sorted(
        qs["quality_score_calibration"].spark(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    n_scored = qs["quality_classifier_score"].spark(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    for r in rows:
        assert 0 <= r["bin"] < N_CALIB_BINS
        assert 0.0 <= r["mean_predicted"] <= 1.0
        assert 0.0 <= r["actual_pass_rate"] <= 1.0
        # bin membership consistent with its mean
        assert r["bin"] / N_CALIB_BINS - 1e-6 <= r["mean_predicted"] \
            <= (r["bin"] + 1) / N_CALIB_BINS + 1e-6
    # weak monotonicity over well-populated bins: the distilled model must
    # not be anti-calibrated (higher predicted -> lower actual)
    big = [r for r in rows if r["n_docs"] >= 10]
    if len(big) >= 2:
        assert big[-1]["actual_pass_rate"] >= big[0]["actual_pass_rate"]


def test_isotonic_calibration_properties(spark):
    """PAVA output pinned against an independent pure-python isotonic
    fit on the same bin aggregates; monotonicity; Brier ordering
    (unconstrained bin rates <= isotonic, by projection)."""
    import numpy as np

    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = (
        load_all()["quality_score_isotonic"].spark(spark, sf).toPandas()
        .sort_values("bin").reset_index(drop=True)
    )
    # independent PAVA: brute-force over the (rate, weight) sequence
    rates = out["raw_rate"].to_numpy(dtype=float)
    weights = out["n_docs"].to_numpy(dtype=float)

    def pava_ref(y, w):
        y = list(map(float, y))
        w = list(map(float, w))
        n = len(y)
        fit = y[:]
        # iterate to fixed point: repeatedly pool any adjacent violator
        changed = True
        blocks = [[fit[i], w[i], [i]] for i in range(n)]
        while changed:
            changed = False
            i = 0
            while i < len(blocks) - 1:
                if blocks[i][0] > blocks[i + 1][0] + 1e-15:
                    r = (blocks[i][0] * blocks[i][1]
                         + blocks[i + 1][0] * blocks[i + 1][1]) / (
                        blocks[i][1] + blocks[i + 1][1]
                    )
                    blocks[i] = [r, blocks[i][1] + blocks[i + 1][1],
                                 blocks[i][2] + blocks[i + 1][2]]
                    del blocks[i + 1]
                    changed = True
                else:
                    i += 1
        res = [0.0] * n
        for r, _w, idxs in blocks:
            for k in idxs:
                res[k] = r
        return np.array(res)

    ref = pava_ref(rates, weights)
    assert np.abs(out["iso_rate"].to_numpy() - np.round(ref, 6)).max() < 2e-6
    # monotone nondecreasing in score bin
    iso = out["iso_rate"].to_numpy()
    assert (np.diff(iso) >= -1e-9).all()
    # Brier ordering: the unconstrained per-bin rate is the Brier-optimal
    # per-bin constant, so adding the monotonicity constraint cannot beat it
    assert out["brier_bin"].iloc[0] <= out["brier_iso"].iloc[0] + 1e-9
    # weighted mean is conserved by PAVA pooling
    assert abs(
        float((iso * weights).sum() - (rates * weights).sum())
    ) < 1e-6 * weights.sum()
    # bins cover all scored documents
    assert out["n_docs"].sum() > 0


def test_train_partitions_is_a_pinned_model_knob(spark, sf_dir, monkeypatch):
    """TRAIN_PARTITIONS is part of the model definition (RF bootstraps per
    partition): the default must be the documented 8, the env knob must be
    honored on module (re)load, and training with a different value must
    still produce a valid, accurate forest — raising parallelism for a
    large labeled corpus is safe, it just defines a DIFFERENT (equally
    deterministic) model, like changing SEED."""
    import importlib

    from serene_spark.ml import quality_classifier as qc

    assert qc.TRAIN_PARTITIONS == 8  # documented default

    monkeypatch.setenv("SERENE_QUALITY_TRAIN_PARTITIONS", "16")
    importlib.reload(qc)
    try:
        assert qc.TRAIN_PARTITIONS == 16
        model, holdout = qc.train_quality_model(spark, sf_dir)
        rows = model.transform(holdout).select(
            "quality_pass", "prediction").collect()
        acc = sum(1 for r in rows
                  if r["prediction"] == r["quality_pass"]) / len(rows)
        assert acc >= 0.9, acc
    finally:
        monkeypatch.delenv("SERENE_QUALITY_TRAIN_PARTITIONS")
        importlib.reload(qc)
    assert qc.TRAIN_PARTITIONS == 8
