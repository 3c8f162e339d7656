"""End-to-end semantic-type classification: train on 2 fixture tables,
predict the 3rd, accuracy > 0.9 (mirrors the reference's homeseekers
threshold, core/.../SparkParallelSpec.scala:436-438) + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def _split_fixture(spark):
    from serene_spark.ml.pipeline import make_fixture_long, profile_features_from_long

    long_df, labels_df = make_fixture_long(spark, n_tables=3, n_rows=120)
    train_long = long_df.filter(~F.col("column_name").endswith("@table2"))
    test_long = long_df.filter(F.col("column_name").endswith("@table2"))
    train = profile_features_from_long(spark, train_long).join(labels_df, "column_name")
    test_feats = profile_features_from_long(spark, test_long)
    return train, test_feats, labels_df


def test_accuracy_above_threshold(spark):
    from serene_spark.ml.pipeline import predict_semantic_types, train_semantic_classifier

    train, test_feats, labels_df = _split_fixture(spark)
    model, conv = train_semantic_classifier(spark, train)
    preds = predict_semantic_types(model, conv, test_feats).join(labels_df, "column_name")
    rows = preds.collect()
    acc = sum(r["predicted_class"] == r["class"] for r in rows) / len(rows)
    assert acc > 0.9, f"accuracy {acc} on {len(rows)} columns"
    assert all(0.0 <= r["confidence"] <= 1.0 for r in rows)


def test_prediction_deterministic(spark):
    from serene_spark.ml.pipeline import predict_semantic_types, train_semantic_classifier

    train, test_feats, _ = _split_fixture(spark)
    out = []
    for _ in range(2):
        model, conv = train_semantic_classifier(spark, train)
        out.append(
            sorted(
                (r["column_name"], r["predicted_class"], r["confidence"])
                for r in predict_semantic_types(model, conv, test_feats).collect()
            )
        )
    assert out[0] == out[1]


def test_small_training_set_uses_fewer_trees(spark):
    """< 20 training rows => 10 trees (TrainMlib:164-171)."""
    from serene_spark.ml.pipeline import RF_TREES_SMALL, train_semantic_classifier

    train, _, _ = _split_fixture(spark)
    small = train.limit(15)
    model, _ = train_semantic_classifier(spark, small)
    assert model.stages[-1].getNumTrees == RF_TREES_SMALL
