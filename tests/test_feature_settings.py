"""Feature-config JSON gating (SURVEY §2.12; FeatureSettings.scala:9-60):
the config selects exactly which profiling features are computed and which
columns feed the model's VectorAssembler."""

from __future__ import annotations

import json

import pytest

from serene_spark.ml.feature_settings import (
    ALL_FEATURES,
    ALL_GROUPS,
    FeatureSettings,
)

SUBSET_CONFIG = {
    "activeFeatures": ["num-unique-vals", "prop-missing-vals", "shannon-entropy"],
    "activeFeatureGroups": ["stats-of-text-length"],
    "featureExtractorParams": [
        {"name": "prop-instances-per-class-in-knearestneighbours",
         "num-neighbours": "5"}
    ],
}


def test_parse_reference_json_shape():
    fs = FeatureSettings.from_json(json.dumps(SUBSET_CONFIG))
    assert fs.active_features == {"num-unique-vals", "prop-missing-vals", "shannon-entropy"}
    assert fs.active_feature_groups == {"stats-of-text-length"}
    assert fs.feature_extractor_params[
        "prop-instances-per-class-in-knearestneighbours"
    ]["num-neighbours"] == "5"


def test_default_is_everything():
    fs = FeatureSettings()
    assert fs.active_features == ALL_FEATURES
    assert fs.active_feature_groups == ALL_GROUPS
    assert len(fs.matrix_columns()) == 17 + 5 + 4  # scalars + textlen + numeric


def test_unknown_feature_name_rejected():
    with pytest.raises(ValueError, match="no-such-feature"):
        FeatureSettings(active_features=frozenset({"no-such-feature"}))


def test_gated_profile_matrix_columns(spark):
    from serene_spark.ml.pipeline import make_fixture_long, profile_features_from_long

    fs = FeatureSettings.from_json(json.dumps(SUBSET_CONFIG))
    long_df, _labels = make_fixture_long(spark, n_tables=1, n_rows=30)
    feats = profile_features_from_long(spark, long_df, settings=fs)
    assert feats.columns == ["column_name"] + fs.matrix_columns()
    assert set(fs.matrix_columns()) == {
        "num_unique_vals", "prop_missing_vals", "shannon_char_entropy",
        "mean_len", "median_len", "mode_len", "min_len", "max_len",
    }
    assert feats.count() == 8  # one row per fixture column


def test_trained_model_uses_exactly_gated_features(spark):
    """A model trained under a subset config must assemble exactly those
    features — the VectorAssembler records the gated columns."""
    from serene_spark.ml.pipeline import (
        make_fixture_long,
        profile_features_from_long,
        train_semantic_classifier,
    )

    fs = FeatureSettings.from_json(json.dumps(SUBSET_CONFIG))
    long_df, labels_df = make_fixture_long(spark, n_tables=2, n_rows=40)
    feats = profile_features_from_long(spark, long_df, settings=fs).join(
        labels_df, "column_name"
    )
    model, _conv = train_semantic_classifier(spark, feats)
    assembler = model.stages[1]
    assert list(assembler.getInputCols()) == fs.matrix_columns()


def test_cli_profile_with_feature_config(spark, tmp_path, capsys):
    from serene_spark import cli

    data = tmp_path / "d.csv"
    data.write_text("a,b\nx1,1\ny2,2\nz3,3\n")
    cfg = tmp_path / "features.json"
    cfg.write_text(json.dumps(SUBSET_CONFIG))
    assert cli.main(["profile", str(data), "--features", str(cfg)]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    got_cols = set(lines[0]) - {"column_name"}
    assert got_cols == {
        "num_unique_vals", "prop_missing_vals", "shannon_char_entropy",
        "mean_len", "median_len", "mode_len", "min_len", "max_len",
    }
