"""MinHashLSH candidate recall vs the exact shingle-Jaccard pairs."""

from __future__ import annotations

import duckdb


def test_ml_minhash_recall_vs_exact(spark, sf_dir):
    from serene_spark.ml.minhash_lsh import dedup_ml_minhash
    from serene_spark.operators.dedup import ngram_jaccard_sql

    got = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup_ml_minhash(spark, sf_dir).collect()
    }

    duckdb.sql(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exact = {
        (r[0], r[1]) for r in duckdb.sql(ngram_jaccard_sql("duckdb")).fetchall()
    }

    assert exact, "fixture should contain exact near-dup pairs"
    recall = len(got & exact) / len(exact)
    # 8 hash tables at threshold 0.2: every true pair should surface at this
    # corpus size; allow one stray miss before failing
    assert recall >= 0.9, (recall, len(exact), len(got))
