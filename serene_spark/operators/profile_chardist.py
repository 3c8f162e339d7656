"""Character-distribution group features (SURVEY §2.4).

Reference: 98-dim L2-normalized char-frequency vector per column
(matcher/.../features/FeatureExtractor.scala:565-656, same math in
SimpleAttribute.scala:60-96) and the normalized Shannon char-entropy feature
(FeatureExtractor.scala:463-514).

Spark shape: ``explode(split(value, ''))`` then two narrow aggregations —
per-(column, char) counts, then per-column normalization. At scale this is
the one profiling op with a second shuffle; both stages are partial-agg
friendly and stay in whole-stage codegen.

Divergence: the reference clips to a fixed 98-char alphabet and downscales by
max count to avoid overflow (SimpleAttribute.scala:60-96); 64-bit counts need
no downscaling, and we emit exactly the chars present (the missing entries of
the fixed alphabet are zeros by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import COLUMNS, load_table
from serene_spark.functions.melt import melt_ids, melt_sql
from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.registry import register

NONEMPTY = "length(trim(value)) > 0"


def _chars_rel(long_rel: str, dialect: str) -> str:
    """Explode characters of DISTINCT values only, carrying the value count
    as a weight — repeated values (flag/status columns) cost one explode, not
    one per row; char counts are then count-weighted sums."""
    vhist = (
        f"SELECT column_name, value, CAST(COUNT(*) AS BIGINT) AS vcnt "
        f"FROM {long_rel} AS lr WHERE {NONEMPTY} GROUP BY column_name, value"
    )
    if dialect == DUCKDB:
        return (
            f"SELECT column_name, unnest(string_split(value, '')) AS ch, vcnt "
            f"FROM ({vhist}) vh"
        )
    return (
        f"SELECT column_name, explode(split(value, '')) AS ch, vcnt "
        f"FROM ({vhist}) vh"
    )


def chardist_sql(long_rel: str, dialect: str) -> str:
    """Per (column, char): count and L2-normalized frequency."""
    return f"""
WITH chars AS ({_chars_rel(long_rel, dialect)}),
counts AS (
  SELECT column_name, ch, CAST(SUM(vcnt) AS BIGINT) AS cnt
  FROM chars WHERE length(ch) > 0 GROUP BY column_name, ch
),
norms AS (
  SELECT column_name, sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS l2
  FROM counts GROUP BY column_name
)
SELECT c.column_name, c.ch, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / n.l2, 6) AS freq_l2
FROM counts c JOIN norms n ON c.column_name = n.column_name
"""


def char_entropy_sql(long_rel: str, dialect: str) -> str:
    """Per column: total/distinct chars + normalized Shannon char-entropy.

    shannon = -(sum p*log2 p) / log2(98)  with p = cnt/total, computed via the
    order-insensitive identity  -sum p log2 p = log2(tot) - (sum c*log2 c)/tot.
    """
    return f"""
WITH chars AS ({_chars_rel(long_rel, dialect)}),
counts AS (
  SELECT column_name, ch, CAST(SUM(vcnt) AS BIGINT) AS cnt
  FROM chars WHERE length(ch) > 0 GROUP BY column_name, ch
)
SELECT column_name,
       CAST(SUM(cnt) AS BIGINT) AS total_chars,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       round(
         (log2(CAST(SUM(cnt) AS DOUBLE))
          - SUM(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE))) / SUM(cnt)
         ) / log2(98.0), 6) AS shannon_char_entropy
FROM counts GROUP BY column_name
"""


def _spark_over_melt(sql_fn, table: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        view = f"__serene_long_{table}"
        # int column ids through the explode/count passes (guide §2.3),
        # mapped back to names in the final small projection
        long_df, name_case = melt_ids(load_table(spark, sf_dir, table))
        long_df.createOrReplaceTempView(view)
        return spark.sql(sql_fn(view, SPARK)).withColumn(
            "column_name", F.expr(name_case)
        )

    return run


for _t in ("customer", "documents"):
    register(
        f"chardist_{_t}",
        oracle=chardist_sql(melt_sql(_t, COLUMNS[_t]), DUCKDB),
        doc=f"SURVEY §2.4 char-dist-features: L2-normalized char frequencies of `{_t}`",
    )(_spark_over_melt(chardist_sql, _t))
    register(
        f"char_entropy_{_t}",
        oracle=char_entropy_sql(melt_sql(_t, COLUMNS[_t]), DUCKDB),
        doc=f"SURVEY §2.3 shannon-entropy (normalized char entropy) of `{_t}`",
    )(_spark_over_melt(char_entropy_sql, _t))
