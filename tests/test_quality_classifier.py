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
