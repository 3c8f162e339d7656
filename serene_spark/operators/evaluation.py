"""Evaluation operators (SURVEY §2.11).

Reference: ``ConfusionMatrix`` / ``EvaluationMetrics`` compute TP/FP/TN/FN,
precision, recall, f1 (matcher/.../matcher/eval/metrics/ConfusionMatrix.scala:3-17,
EvaluationMetrics.scala:5-21); ``DataPartitioner`` makes seeded train/test
splits keyed by attribute or dataset (matcher/.../matcher/eval/DataPartitioner.scala:9-100).

Rebuilt Spark-first:
- the confusion matrix is one ``groupBy(actual, predicted).count()`` over the
  joined (gold, predicted) labels — a single shuffle at any scale;
- per-class one-vs-rest precision/recall/F1 derive from the matrix with three
  conditional aggregations (no second pass over the data);
- the holdout partitioner is **deterministic-hash** rather than seeded-RNG
  (documented divergence, SURVEY §7 risk 2): split membership is a pure
  function of the row key via md5, so it is reproducible across engines,
  partitionings, and reruns — lexicographic comparison on the first 4 hex
  digits gives 16^4-granular proportions.

The gold/predicted pair here is the engine's own lang-ID heuristic
(operators/text_analysis.py) against the ``documents.lang`` column, making
the whole matcher-eval path oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.operators.text_analysis import lang_id_sql
from serene_spark.registry import register

# 0xb332 / 0xffff ~= 0.6999 — the reference's default holdout proportion is a
# free parameter; 70/30 matches its evaluate.sh experiments.
HOLDOUT_HEX = "b332"


def _pred_vs_gold(dialect: str) -> str:
    """CTE block: (actual, predicted) per doc from lang-ID vs the gold lang."""
    return f"""
preds AS ({lang_id_sql(dialect)}),
pairs AS (
  SELECT d.lang AS actual, p.pred_lang AS predicted
  FROM documents d JOIN preds p ON d.doc_id = p.doc_id
)"""


def confusion_matrix_sql(dialect: str) -> str:
    return f"""
WITH {_pred_vs_gold(dialect)}
SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY actual, predicted
"""


def prf1_sql(dialect: str) -> str:
    """Per-class one-vs-rest precision / recall / F1 + support.

    Derived entirely from the confusion matrix — the raw pairs are touched
    once (one shuffle); everything after operates on the |classes|^2-row
    matrix, so no per-class pass over the data at scale.
    """
    return f"""
WITH {_pred_vs_gold(dialect)},
cm AS (
  SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY actual, predicted
),
classes AS (
  SELECT actual AS cls FROM cm
  UNION SELECT predicted AS cls FROM cm
),
per_class AS (
  SELECT c.cls,
         CAST(COALESCE(SUM(CASE WHEN cm.actual = c.cls AND cm.predicted = c.cls THEN cm.n END), 0) AS BIGINT) AS tp,
         CAST(COALESCE(SUM(CASE WHEN cm.actual <> c.cls AND cm.predicted = c.cls THEN cm.n END), 0) AS BIGINT) AS fp,
         CAST(COALESCE(SUM(CASE WHEN cm.actual = c.cls AND cm.predicted <> c.cls THEN cm.n END), 0) AS BIGINT) AS fn
  FROM classes c CROSS JOIN cm
  GROUP BY c.cls
)
SELECT cls, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN 0.0 ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn = 0 THEN 0.0 ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
            ELSE round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END AS f1,
       CAST(tp + fn AS BIGINT) AS support
FROM per_class
"""


def holdout_split_sql(dialect: str) -> str:
    """Deterministic 70/30 split of customer keyed by md5(c_custkey).

    Returns per-(split, class) counts — the check that the split is
    reproducible and roughly stratified, without materializing row lists.
    """
    key_hex = "substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)"
    if dialect == SPARK:
        key_hex = "substr(md5(CAST(c_custkey AS STRING)), 1, 4)"
    return f"""
WITH tagged AS (
  SELECT c_mktsegment AS cls,
         CASE WHEN {key_hex} <= '{HOLDOUT_HEX}' THEN 'train' ELSE 'test' END AS split
  FROM customer
)
SELECT split, cls, CAST(COUNT(*) AS BIGINT) AS n
FROM tagged GROUP BY split, cls
"""


def _docs_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("documents",), spread=True)
        return spark.sql(sql_fn(SPARK))

    return run


def _customer_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("customer",))
        return spark.sql(sql_fn(SPARK))

    return run


register("eval_confusion_matrix", oracle=confusion_matrix_sql(DUCKDB),
         doc="SURVEY §2.11 confusion matrix (lang-ID predictions vs gold lang)")(_docs_query(confusion_matrix_sql))
register("eval_prf1", oracle=prf1_sql(DUCKDB),
         doc="SURVEY §2.11 per-class precision/recall/F1 from the confusion matrix")(_docs_query(prf1_sql))
register("eval_holdout_split", oracle=holdout_split_sql(DUCKDB),
         doc="SURVEY §2.11 deterministic-hash 70/30 train/test partitioner (stratification counts)")(_customer_query(holdout_split_sql))
