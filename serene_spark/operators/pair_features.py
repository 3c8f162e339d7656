"""Pair-wise column features (SURVEY §2.6) and the term-frequency vector
(SURVEY §2.7).

Reference:
- ``AttributePairFeatureExtractor`` computes per-(column, column) features for
  the legacy unsupervised matcher — numUniqueValsDiff (:33), stringEquality
  (:79), characterFrequencyCosineSimilarity (:215), numCharRatioDiff (:274),
  whitespaceRatio diff (:297), textStats diffs (:318), entropyDifference
  (:332) (matcher/.../matcher/features/AttributePairFeatureExtractor.scala);
- ``DataPreprocessor.computeNormalizedTermFrequencies`` — lowercase, split on
  ``[\\n ,]``, strip punctuation, L2-normalized term counts
  (matcher/.../matcher/features/DataPreprocessor.scala:79-130).

Spark shape (SURVEY §2.6 note): pair features are a SELF-JOIN of the
per-column profile DataFrame — the expensive per-value scans happen once per
column in the §2.3/§2.4 aggregations; the pairing then operates on the
O(#columns)-row profile relation, so the cross join is over column COUNTS,
never row counts. Char-frequency cosine joins the §2.4 char-dist vectors on
the character key (sparse dot product, no dense 98-dim materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import COLUMNS, load_table, register_views
from serene_spark.functions.melt import melt, melt_sql
from serene_spark.functions.sqlgen import DUCKDB, SPARK, rr, split_re
from serene_spark.operators.profile_chardist import chardist_sql
from serene_spark.registry import register

NONEMPTY = "length(trim(value)) > 0"

_TABLE = "customer"


def pair_features_sql(long_rel: str, dialect: str) -> str:
    """Per-column scalar profile once, then a keyed self-join (c1 < c2)."""
    return f"""
WITH prof AS (
  SELECT column_name,
         COUNT(DISTINCT CASE WHEN {NONEMPTY} THEN lower(trim(value)) END) AS n_unique,
         CAST(SUM(CASE WHEN {NONEMPTY} THEN length({rr(dialect, 'value', '[^0-9]')}) ELSE 0 END) AS DOUBLE)
           / NULLIF(SUM(CASE WHEN {NONEMPTY} THEN length(value) ELSE 0 END), 0) AS num_ratio,
         CAST(SUM(length(value) - length({rr(dialect, 'value', '[ ]')})) AS DOUBLE)
           / NULLIF(SUM(length(value)), 0) AS ws_ratio,
         AVG(CASE WHEN {NONEMPTY} THEN CAST(length(value) AS DOUBLE) END) AS mean_len
  FROM {long_rel} AS lr GROUP BY column_name
)
SELECT a.column_name AS col_1, b.column_name AS col_2,
       CAST(abs(a.n_unique - b.n_unique) AS BIGINT) AS unique_vals_diff,
       round(abs(COALESCE(a.num_ratio, 0) - COALESCE(b.num_ratio, 0)), 6) AS num_char_ratio_diff,
       round(abs(COALESCE(a.ws_ratio, 0) - COALESCE(b.ws_ratio, 0)), 6) AS ws_ratio_diff,
       round(abs(a.mean_len - b.mean_len), 6) AS mean_len_diff
FROM prof a JOIN prof b ON a.column_name < b.column_name
"""


def pair_char_cosine_sql(long_rel: str, dialect: str) -> str:
    """characterFrequencyCosineSimilarity (:215): sparse dot product of the
    §2.4 L2-normalized char-dist vectors, joined on the char key."""
    return f"""
WITH dist AS ({chardist_sql(long_rel, dialect)})
SELECT a.column_name AS col_1, b.column_name AS col_2,
       round(CAST(SUM(CAST(a.freq_l2 AS DECIMAL(20, 12)) * CAST(b.freq_l2 AS DECIMAL(20, 12))) AS DOUBLE), 6) AS char_cosine
FROM dist a JOIN dist b ON a.ch = b.ch AND a.column_name < b.column_name
GROUP BY a.column_name, b.column_name
"""


def term_freq_sql(long_rel: str, dialect: str) -> str:
    """Normalized term-frequency vector per column
    (DataPreprocessor.scala:79-130): lowercase, split on whitespace/commas,
    strip non-alphanumerics, drop empties, L2-normalize counts."""
    tok = split_re(dialect, "lower(value)", "[\\n ,]+")
    clean = rr(dialect, "tok", "[^a-z0-9]")
    if dialect == DUCKDB:
        toks_rel = f"SELECT column_name, unnest({tok}) AS tok FROM {long_rel} AS lr WHERE {NONEMPTY}"
    else:
        toks_rel = f"SELECT column_name, explode({tok}) AS tok FROM {long_rel} AS lr WHERE {NONEMPTY}"
    return f"""
WITH toks AS ({toks_rel}),
terms AS (
  SELECT column_name, {clean} AS term FROM toks WHERE length({clean}) > 0
),
counts AS (
  SELECT column_name, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM terms GROUP BY column_name, term
),
norms AS (
  SELECT column_name, sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS l2
  FROM counts GROUP BY column_name
)
SELECT c.column_name, c.term, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / n.l2, 6) AS tf_l2
FROM counts c JOIN norms n ON c.column_name = n.column_name
"""


def _melted_query(sql_fn, table: str = _TABLE):
    view = f"__serene_pair_{table}"

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, (table,))
        melt(load_table(spark, sf_dir, table)).createOrReplaceTempView(view)
        return spark.sql(sql_fn(view, SPARK))

    return run


def _oracle(sql_fn, table: str = _TABLE) -> str:
    return sql_fn(melt_sql(table, COLUMNS[table]), DUCKDB)


register("pair_features_customer", oracle=_oracle(pair_features_sql),
         doc="SURVEY §2.6 pair-wise column features (unique-diff, char-ratio diffs, "
             "text-len diff) via self-join of the per-column profile")(_melted_query(pair_features_sql))
register("pair_char_cosine_customer", oracle=_oracle(pair_char_cosine_sql),
         doc="SURVEY §2.6 characterFrequencyCosineSimilarity: sparse dot product "
             "of §2.4 char-dist vectors over all column pairs")(_melted_query(pair_char_cosine_sql))
register("term_freq_customer", oracle=_oracle(term_freq_sql),
         doc="SURVEY §2.7 L2-normalized term-frequency vector per column")(_melted_query(term_freq_sql))
