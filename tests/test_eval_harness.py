"""Incremental-train-size eval harness + interactive consoles."""

from __future__ import annotations

import io

from serene_spark.interactive import LabelingConsole, ValidationConsole
from serene_spark.operators.eval_harness import incremental_train_eval, summarize_eval


def test_incremental_eval_shape_and_learning(spark):
    from serene_spark.ml.pipeline import make_fixture_long

    long_df, labels_df = make_fixture_long(spark, n_tables=4, n_rows=80)
    results = incremental_train_eval(
        spark, long_df, labels_df, proportions=(0.5, 1.0), repetitions=1
    ).cache()
    rows = results.collect()
    assert {r["train_prop"] for r in rows} == {0.5, 1.0}
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in rows)
    # deterministic: same seed → identical result
    again = incremental_train_eval(
        spark, long_df, labels_df, proportions=(0.5, 1.0), repetitions=1
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    summary = summarize_eval(results).collect()
    classes = {r["class"] for r in summary}
    assert "__class_averaged__" in classes
    # the fixture's classes are well-separated: full-training class-averaged
    # accuracy should be high (SparkParallelSpec-style >0.9 bar, relaxed for
    # the small holdout)
    full = [r for r in summary if r["class"] == "__class_averaged__" and r["train_prop"] == 1.0]
    assert full and full[0]["mean_accuracy"] >= 0.8


def test_labeling_console_roundtrip(tmp_path):
    attrs = [f"col{i}@t@d" for i in range(25)]
    console = LabelingConsole(attributes=attrs, classes=["name", "address"])
    script = io.StringIO(
        "s\n"          # first page
        "m\n"          # second page
        "c\n"
        "nc phone\n"
        "l 0 phone\n"
        "l 1 name\n"
        "l 99 name\n"  # bad index → error message, no crash
        "l 2 nope\n"   # unknown class → error message
        "dc phone\n"   # deleting a class drops its labels
        "x\n"
    )
    out = io.StringIO()
    saved = console.run(script, out)
    assert saved is True
    assert console.labels == {"col1@t@d": "name"}
    assert "Type 'm' to show more." in out.getvalue()
    assert "Invalid attribute index: 99" in out.getvalue()
    assert "Unknown class: nope" in out.getvalue()

    path = tmp_path / "labels.csv"
    console.save(str(path))
    from serene_spark.sources.labels_loader import load_semantic_type_labels

    assert load_semantic_type_labels(str(path))["col1@t@d"].cls == "name"


def test_labeling_console_discard():
    console = LabelingConsole(attributes=["a@t@d"], classes=["name"])
    assert console.run(io.StringIO("l 0 name\nq\n"), io.StringIO()) is False


def test_validation_console(tmp_path):
    preds = [
        ("a@t@d", "name", 0.9, "2016-01-01"),
        ("b@t@d", "phone", 0.8, "2016-01-01"),
        ("c@t@d", "addr", 0.7, "2016-01-01"),
        ("d@t@d", "name", 0.6, "2016-01-01"),
    ]
    console = ValidationConsole(predictions=preds)
    console.run(io.StringIO("y\nn\nemail\nq\n"), io.StringIO())
    assert console.validated == {"a@t@d": "name", "c@t@d": "email"}

    path = tmp_path / "validated.csv"
    console.save(str(path), date_validated="2016-02-01")
    from serene_spark.sources.labels_loader import load_semantic_type_labels

    labels = load_semantic_type_labels(str(path))
    # validated rows load; 'n' and unanswered rows stay "?" and are skipped
    assert labels["a@t@d"].cls == "name"
    assert labels["c@t@d"].cls == "email"
    assert "b@t@d" not in labels and "d@t@d" not in labels
