"""The Spark per-row forms of the per-doc text-analysis family must equal
their DuckDB CTE oracles on HOSTILE inputs the corpus does not contain:
token-less docs (dropped by the CTE forms' inner join / kept all-zero by
repetition's left join), pure repetition, boundary punctuation, stopword-only
text. Parity covers the real corpora; this pins the edge semantics of the
per-row rewrite (sorted-run folds, translate-delete counts, size(toks)>0
guards) directly against the shared-CTE ground truth."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.operators.text_analysis import (
    fingerprint_sql,
    lang_id_sql,
    repetition_sql,
    text_quality_sql,
    token_stats_sql,
)

DOCS = [
    (1, "cat dog."),                # trailing punct: 2 tokens, 1 bigram, 0 trigrams
    (2, "go go go go"),             # pure repetition
    (3, "x"),                       # 1 token
    (4, ""),                        # empty text -> no tokens
    (5, "...!!!"),                  # punct-only -> no tokens
    (6, "the and of to is"),        # stopwords only
    (7, "The QUICK brown fox 42 jumped over 13 lazy dogs, twice; the fox won."),
    (8, "a1b2 a1b2 c3 \t\n mixed\rwhitespace  runs"),  # ws variants + dups
    (9, "Zz zz zZ ZZ"),             # case-folding dups
]


@pytest.fixture(scope="module")
def hostile(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    df.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    yield spark, con
    spark.catalog.dropTempView("documents")


@pytest.mark.parametrize(
    "sql_fn",
    [text_quality_sql, lang_id_sql, token_stats_sql, fingerprint_sql, repetition_sql],
    ids=["text_quality", "lang_id", "token_stats", "fingerprint", "repetition"],
)
def test_onepass_equals_duckdb_cte_on_hostile_docs(hostile, sql_fn):
    spark, con = hostile
    got = spark.sql(sql_fn(SPARK)).toPandas()
    want = con.execute(sql_fn(DUCKDB)).df()
    assert list(got.columns) == list(want.columns)
    key = list(got.columns)
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )
