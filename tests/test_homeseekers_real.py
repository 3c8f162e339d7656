"""REAL homeseekers.csv accuracy gates (round-4 top item).

These tests run the reference's flagship matcher validation protocol
(SparkParallelSpec.scala:404-447 NoResampling, :449-500 Bagging 50x50) on
the reference's OWN test dataset, read-only, through the repo's CSV loader
and ML pipeline — converting the >0.9 claim from the synthetic analog
(tests/test_homeseekers.py) to the reference's actual benchmark file.
"""

from __future__ import annotations

import os

import pytest

from serene_spark.ml.homeseekers_real import (
    DEFAULT_LABELS,
    HOMESEEKERS_CSV,
    accuracy,
    load_homeseekers_long,
    train_and_predict_real,
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(HOMESEEKERS_CSV),
    reason="reference homeseekers.csv not mounted",
)


def test_load_real_homeseekers(spark):
    """2,367 data rows x 33 columns through the repo CSV loader; label map
    applied by header position (SparkParallelSpec.scala:272-282)."""
    long_df, labels_df = load_homeseekers_long(spark)
    assert labels_df.count() == 18
    per_col = {r.column_name: r.n for r in
               long_df.groupBy("column_name").count().withColumnRenamed("count", "n").collect()}
    assert len(per_col) == 18
    assert all(n == 2367 for n in per_col.values())
    label_map = {r.column_name: r["class"] for r in labels_df.collect()}
    # spot-pin positional labels: index 4 -> address, 14 (office) -> phone,
    # 27 (lot_size) -> size — the reference's own mapping, verbatim
    assert label_map["location_residential_listing___basic_features_house_listing"] == "address"
    assert label_map["office_house_listing"] == "phone"
    assert label_map["lot_size_residential_listing___basic_features_house_listing"] == "size"
    assert sorted(set(label_map.values())) == sorted(set(DEFAULT_LABELS.values()))


def test_real_accuracy_gate(spark):
    """'train and predict and check accuracy' (:404-447): > 0.9 on the real
    file. Measured this session: 0.944 (17/18 — garage misclassified, the
    same one-column-miss shape the reference's comment documents for
    office@house_listing)."""
    preds, labels = train_and_predict_real(spark)
    acc = accuracy(preds, labels)
    assert acc > 0.9, f"real homeseekers accuracy {acc} <= 0.9"


def test_real_bagging_gate(spark):
    """'train and predict with bagging' (:449-500): numBags=50, bagSize=50,
    > 0.9. Measured this session: 1.0."""
    preds, labels = train_and_predict_real(spark, n_bags=50, bag_size=50)
    acc = accuracy(preds, labels)
    assert acc > 0.9, f"real homeseekers bagging accuracy {acc} <= 0.9"


def test_registered_query(spark, sf_dir):
    from serene_spark.ml.homeseekers_real import (
        semantic_type_predict_homeseekers_real,
    )

    out = semantic_type_predict_homeseekers_real(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 18
    assert out.columns == ["column_name", "predicted_class", "class", "confidence"]
    hits = sum(1 for r in rows if r.predicted_class == r["class"])
    assert hits / len(rows) > 0.9


def test_real_learning_curve(spark):
    """Incremental-train-size harness (§2.11) on the REAL file: with only 18
    labeled columns the curve is coarse, but accuracy at full train
    proportion must beat the smallest proportion's (the harness's
    monotone-ish sanity the fixture gate also pins), and every reported
    class accuracy is well-formed."""
    from serene_spark.operators.eval_harness import incremental_train_eval

    long_df, labels_df = load_homeseekers_long(spark)
    out = incremental_train_eval(
        spark, long_df, labels_df, proportions=(0.4, 1.0), repetitions=1
    ).collect()
    assert out
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in out)

    def overall(prop):
        rows = [r for r in out if abs(r["train_prop"] - prop) < 1e-9]
        hits = sum(r["accuracy"] * r["n_test"] for r in rows)
        n = sum(r["n_test"] for r in rows)
        return hits / n

    assert overall(1.0) >= overall(0.4)
    assert overall(1.0) >= 0.5  # real data, 18 columns: full-train is usable
