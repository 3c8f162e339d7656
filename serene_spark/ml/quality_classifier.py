"""Model-based quality filter over the documents table.

The production pattern (CCNet / GPT-3-style corpus construction): a cheap
classifier distills the quality signal — there a fasttext model trained on
wiki-vs-crawl, here a Spark ML random forest distilling the repo's own
rule-based ``quality_pass`` gate (text_quality_sql) from its UNDERLYING
continuous features. Distilling a heuristic into a model is itself a real
pipeline step: the model generalizes the rule to inputs where individual
heuristic signals are missing, and exports a calibrated probability instead
of a hard gate.

Scale shape: features come from the one-pass token aggregation of
text_quality_sql (no Python); training rows are documents (fits any cluster
— RF training is Spark ML's distributed impurity-histogram implementation);
scoring is a map-only model broadcast. The train/holdout split is a
deterministic doc_id hash so every engine/run draws the same split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.text_analysis import text_quality_sql
from serene_spark.registry import register

FEATURES = [
    "n_chars",
    "n_tokens",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_ratio",
]
SEED = 5043          # same RF seed discipline as ml/pipeline.py
N_TREES = 32
MAX_DEPTH = 5
HOLDOUT_MOD = 5      # doc_id % 5 == 0 -> holdout


def quality_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature relation: text_quality_sql's continuous features + the rule
    gate as the weak label."""
    register_views(spark, sf_dir, ("documents",), spread=True)
    return spark.sql(text_quality_sql(SPARK))


def train_quality_model(spark: SparkSession, sf_dir: str):
    """Fit the distillation forest on the non-holdout documents; returns
    (model, holdout_frame)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    df = quality_frame(spark, sf_dir).withColumn(
        "label", F.col("quality_pass").cast("double")
    )
    train = df.filter(F.col("doc_id") % HOLDOUT_MOD != 0)
    holdout = df.filter(F.col("doc_id") % HOLDOUT_MOD == 0)
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=FEATURES, outputCol="features"),
        RandomForestClassifier(
            numTrees=N_TREES, maxDepth=MAX_DEPTH, seed=SEED,
            labelCol="label", featuresCol="features",
        ),
    ])
    return pipe.fit(train), holdout


def _prob_good(scored: DataFrame, n_classes: int) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    # a degenerate corpus (every training doc on one side of the rule gate)
    # trains a single-class forest whose probability vector has length 1;
    # p(good) is then just the predicted constant class, not element 2
    if n_classes >= 2:
        get_p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    else:
        get_p1 = F.col("prediction").cast("double")
    return scored.select(
        "doc_id",
        F.col("quality_pass").cast("bigint").alias("rule_label"),
        F.round(get_p1, 6).alias("prob_good"),
        F.col("prediction").cast("bigint").alias("pred"),
    )


@register(
    "quality_classifier_score",
    doc="model-based quality filter: RF distilled from the rule gate, "
    "per-doc calibrated probability (rows-only; accuracy pinned by pytest)",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the distilled quality model."""
    model, _ = train_quality_model(spark, sf_dir)
    n_classes = model.stages[-1].numClasses
    return _prob_good(model.transform(quality_frame(spark, sf_dir)), n_classes)


N_CALIB_BINS = 10


@register(
    "quality_score_calibration",
    doc="decile reliability diagram for the distilled quality model: per "
    "score bin, mean predicted p(good) vs the rule gate's actual pass "
    "rate (rows-only; monotonicity + bin accounting pinned by pytest)",
)
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for the distilled quality
    classifier: bin every document by predicted p(good) into
    ``N_CALIB_BINS`` equal-width bins and compare the bin's mean predicted
    probability against the ACTUAL rule-gate pass rate — the standard
    check before using model scores as sampling weights or thresholds
    (a well-calibrated model's curve hugs the diagonal; a gap is exactly
    the correction a downstream threshold must absorb).

    Scale shape: scoring is the existing model transform (broadcast
    model); the diagram is one bin-keyed aggregation over (bin, label,
    prob) — map-side combinable, N_CALIB_BINS output rows.
    """
    scored = quality_classifier_score(spark, sf_dir)
    b = F.least(
        F.lit(N_CALIB_BINS - 1),
        F.floor(F.col("prob_good") * N_CALIB_BINS).cast("int"),
    )
    return (
        scored.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg("prob_good"), 6).alias("mean_predicted"),
            F.round(F.avg(F.col("rule_label").cast("double")), 6).alias("actual_pass_rate"),
        )
        .orderBy("bin")
    )
