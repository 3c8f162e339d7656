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
    exact_rows = duckdb.sql(ngram_jaccard_sql("duckdb")).fetchall()
    exact = {(r[0], r[1]) for r in exact_rows}

    assert exact, "fixture should contain exact near-dup pairs"
    # 8 hash tables are OR-amplification of single hash functions: a pair at
    # similarity s surfaces with probability 1-(1-s)^8 — only ~0.83 right at
    # the 0.2 threshold, so gating full recall there is probabilistically
    # fragile against a testdata regeneration. Gate recall on the pairs at
    # >= 0.35 similarity (per-pair surface probability ~0.97), where >= 0.9
    # set recall is robust; still require that SOME of the borderline pairs
    # surface overall.
    strong = {(r[0], r[1]) for r in exact_rows if r[2] >= 0.35}
    assert strong, "fixture should contain strong near-dup pairs"
    recall_strong = len(got & strong) / len(strong)
    assert recall_strong >= 0.9, (recall_strong, len(strong), len(got))
    assert got & exact, "no exact pair surfaced at all"
