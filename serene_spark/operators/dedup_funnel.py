"""Dedup funnel accounting — "what did each dedup tier buy, per source":
the table a curation run prints before committing to a corpus mix.

``dedup_funnel_report``: per source, document and word-token counts at
three stages —

1. RAW — everything ingested;
2. EXACT — keep-first (min doc_id) per normalized-text hash, the
   ``dedup_exact`` rule verbatim (same ``norm_expr``);
3. NEAR-DUP — exact survivors minus the higher-id member of every
   VERIFIED LSH pair (the ``dedup_lsh_verified`` pipeline: banded
   candidates, exact shingle-Jaccard ≥ 0.2).  Pair-level keep-first is
   the deterministic greedy form; the cluster-canonical variant lives in
   ``dedup_canonical_select`` — this report measures budget, and for
   budget the pair rule upper-bounds the removable mass per pair chain.

Emits per stage the kept-token percentage so the funnel reads directly
as a budget statement.  Token counts are the regex word convention
(token_stats); all counts exact integers.

Scale: the verified-pair relation is the materialized LSH pipeline
(never all-pairs); the funnel itself is three semi/anti joins + one
source-keyed agg.
"""

from __future__ import annotations

from serene_spark.catalog import compose_with
from serene_spark.functions.sqlgen import DUCKDB, SPARK, mat, re_extract_all_count
from serene_spark.operators.dedup import docsketch_rel, norm_expr, verified_body
from serene_spark.registry import register


def _tok_body(dialect: str) -> str:
    words = re_extract_all_count(dialect, "text", "[A-Za-z0-9]+")
    return f"""tok AS {mat(dialect)}(
  SELECT doc_id, source, {words} AS n_tok,
         md5({norm_expr(dialect)}) AS text_hash
  FROM documents
)"""


def _bases(dialect: str) -> list[tuple[str, str]]:
    m = mat(dialect)
    # verified_body is "<ctes>\nSELECT ..." — wrap its final SELECT as the
    # pairs CTE so the whole verified-LSH pipeline materializes once
    vb = verified_body(dialect)
    ctes, select = vb.rsplit("SELECT m.d1 AS doc_id_1", 1)
    pairs_body = (
        f"{docsketch_rel(dialect)},\n{ctes.rstrip()},\n"
        f"pairs AS {m}(SELECT m.d1 AS doc_id_1{select})"
    )
    return [("tok", _tok_body(dialect)), ("pairs", pairs_body)]


def _tail(dialect: str, tok: str = "tok", pairs: str = "pairs") -> str:
    # default relation names ARE the oracle text (compose_with below) —
    # the Spark runner passes __df_-prefixed temp-view names so a shared
    # session can never collide on the generic names (ADVICE r12)
    return f"""
WITH keep_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM {tok} GROUP BY text_hash
),
near_drop AS (
  SELECT DISTINCT doc_id_2 AS doc_id FROM {pairs}
),
staged AS (
  SELECT t.source, t.n_tok,
         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s_exact,
         CASE WHEN k.doc_id IS NOT NULL AND d.doc_id IS NULL THEN 1 ELSE 0 END
           AS s_near
  FROM {tok} t
  LEFT JOIN keep_exact k ON t.doc_id = k.doc_id
  LEFT JOIN near_drop d ON t.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs_raw,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_raw,
       CAST(SUM(s_exact) AS BIGINT) AS docs_exact,
       CAST(SUM(s_exact * n_tok) AS BIGINT) AS tokens_exact,
       CAST(SUM(s_near) AS BIGINT) AS docs_neardup,
       CAST(SUM(s_near * n_tok) AS BIGINT) AS tokens_neardup,
       ROUND(CAST(SUM(s_near * n_tok) AS DOUBLE) / SUM(n_tok), 6)
         AS pct_tokens_kept
FROM staged
GROUP BY source
ORDER BY source
"""


def _spark_run(spark, sf_dir):
    """Spark runner. The pairs base is NOT materialized from its one-statement
    body (Catalyst inlines CTEs, so the docsketch pipeline — shingle explode,
    md5, 16 mins — would re-derive at each of its ~4 reference sites inside
    verified_body; measured 14.4 s at sf0.01). Instead it reuses the staged
    LSH runner, whose docsk/bands checkpoints compute each relation once —
    pinned to the oracle's fixed default geometry (``BAND_SIZE``), which is
    what the one-statement body always encoded. Measured 14.4 -> ~4 s; the
    tok base and tail are unchanged."""
    from serene_spark.catalog import register_views
    from serene_spark.materialize import materialize
    from serene_spark.operators.dedup import BAND_SIZE, dedup_lsh_verified_spark

    register_views(spark, sf_dir, ("documents",), spread=True)
    materialize(
        spark.sql(f"WITH {_tok_body(SPARK)} SELECT * FROM tok")
    ).createOrReplaceTempView("__df_tok")
    # referenced once by the tail -> a view suffices, no extra checkpoint
    dedup_lsh_verified_spark(
        spark, sf_dir, band_size=BAND_SIZE
    ).createOrReplaceTempView("__df_pairs")
    return spark.sql(_tail(SPARK, tok="__df_tok", pairs="__df_pairs"))


register(
    "dedup_funnel_report",
    oracle=compose_with(_bases(DUCKDB), _tail(DUCKDB)),
    doc="Per-source dedup funnel: raw -> exact keep-first -> verified-LSH "
    "pair keep-first, doc and word-token counts per stage + kept-token "
    "share — the budget table a curation run prints before mixing",
)(_spark_run)
