"""Vocabulary induction and embedding-space audit operators.

* ``bpe_top_merges`` — the statistic one BPE training round computes
  (Sennrich et al., "Neural Machine Translation of Rare Words with Subword
  Units", ACL 2016): frequencies of ADJACENT token pairs within documents,
  ranked; the top pair is the round's merge.  Each fixed round is plain
  SQL (adjacent index pairs from one position explode — map-only), so the
  per-round statistic is oracle-exact;
  a full trainer loops this exact query, re-tokenizing with the merged
  vocabulary between rounds (iterative — the driver shape, like Lloyd
  refinement in IVF).
* ``embedding_dim_stats`` — per-dimension mean / std / min / max / zero
  fraction over the embedding corpus: the feature-scaling audit run before
  normalization or ANN indexing (dead or degenerate dimensions break
  cosine geometry).  Variance derives from decimal-exact Σx and Σx², so
  partial-aggregation order cannot move it.

Scale shapes: both are one scan + one keyed agg; the pair relation keys on
(token pair) — high cardinality; the dim relation keys on dimension index
(64 keys) but the map-side combine reduces each partition to 64 rows before
the shuffle, so parallelism caps only at the reduce (standard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import (
    DUCKDB,
    SPARK,
    element_at,
    explode_seq,
    split_re,
)
from serene_spark.operators.text_analysis import NORM
from serene_spark.registry import register

TOP_MERGES = 20
EMB_DIM = 64


def bpe_top_merges_sql(dialect: str) -> str:
    """Adjacent-pair frequencies over in-document token order, top-{TOP_MERGES}."""
    toks = split_re(dialect, NORM(dialect), "[^a-z0-9]+")
    n = "size(toks)" if dialect == SPARK else "len(toks)"
    t_i = element_at(dialect, "toks", "i")
    t_next = element_at(dialect, "toks", "i + 1")
    return f"""
WITH doc_toks AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {toks} AS toks FROM documents) d
),
pairs AS (
  SELECT {t_i} AS left_tok, {t_next} AS right_tok
  FROM (
    SELECT doc_id, toks, {explode_seq(dialect, 1, f"{n} - 1")} AS i
    FROM doc_toks WHERE {n} >= 2
  ) p
  WHERE {t_i} <> '' AND {t_next} <> ''
),
counts AS (
  SELECT left_tok, right_tok, COUNT(*) AS pair_count
  FROM pairs GROUP BY left_tok, right_tok
)
SELECT left_tok, right_tok, CAST(pair_count AS BIGINT) AS pair_count
FROM counts
ORDER BY pair_count DESC, left_tok, right_tok
LIMIT {TOP_MERGES}
"""


def embedding_dim_stats_sql(dialect: str) -> str:
    """Values quantize to integer MICRO-UNITS via FLOOR of the exact
    float->double value: float->DECIMAL casts round differently across
    engines at the last digit (measured), while double multiply + FLOOR is
    IEEE-identical everywhere.  All moments then run in exact integers."""
    v = element_at(dialect, "embedding", "i")
    return f"""
WITH dims AS (
  SELECT i, CAST(FLOOR(CAST({v} AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM (
    SELECT embedding, {explode_seq(dialect, 1, EMB_DIM)} AS i FROM embeddings
  ) e
)
SELECT CAST(i AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean,
       ROUND(sqrt((CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DOUBLE)
                   - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) / COUNT(*))
                  / (COUNT(*) - 1)) / 1e6, 6) AS std,
       ROUND(CAST(MIN(x) AS DOUBLE) / 1e6, 6) AS min_x,
       ROUND(CAST(MAX(x) AS DOUBLE) / 1e6, 6) AS max_x,
       ROUND(CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS zero_frac
FROM dims
GROUP BY i
"""


def _docs_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("documents",), spread=True)
        return spark.sql(sql_fn(SPARK))

    return run


def _emb_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("embeddings",), spread=True)
        return spark.sql(sql_fn(SPARK))

    return run


register(
    "bpe_top_merges",
    oracle=bpe_top_merges_sql(DUCKDB),
    doc=f"BPE training-round statistic: top-{TOP_MERGES} adjacent token-pair "
    "frequencies (the round's merge candidates), distributed TakeOrdered",
)(_docs_query(bpe_top_merges_sql))

register(
    "embedding_dim_stats",
    oracle=embedding_dim_stats_sql(DUCKDB),
    doc="per-dimension embedding audit: mean/std/min/max/zero-fraction "
    "with decimal-exact moment sums",
)(_emb_query(embedding_dim_stats_sql))
