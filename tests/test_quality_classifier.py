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
