"""Recall pins for the product-quantization search tier.

Engine equivalence is oracle-checked (both PQ queries carry DuckDB
oracles); these pin SEARCH QUALITY against the exact brute-force baseline.
Note the corpus is random gaussian vectors — PQ's worst case (distances
concentrate, quantization error is maximal); real text embeddings with low
intrinsic dimension fare far better at the same geometry.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import DUCKDB
from serene_spark.operators.similarity import (
    PQ_M,
    PQ_RERANK_POOL,
    cosine_topk_sql,
    pq_adc_sql,
    pq_rerank_sql,
)


def _topk_sets(rows):
    out = {}
    for q, n, _score, _rk in rows:
        out.setdefault(q, set()).add(n)
    return out


def test_adc_beats_random_and_rerank_beats_adc(duck):
    exact = _topk_sets(duck.execute(cosine_topk_sql(DUCKDB)).fetchall())
    adc = _topk_sets(duck.execute(pq_adc_sql(DUCKDB)).fetchall())
    rer = _topk_sets(duck.execute(pq_rerank_sql(DUCKDB)).fetchall())
    n_corpus = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]

    def recall(approx):
        vals = [
            len(approx.get(q, set()) & s) / len(s) for q, s in exact.items()
        ]
        return sum(vals) / len(vals)

    r_adc, r_rer = recall(adc), recall(rer)
    # random-pick baseline: k/(n-1) expected overlap
    random_baseline = 5.0 / (n_corpus - 1)
    assert r_adc > 10 * random_baseline, (r_adc, random_baseline)
    # the exact re-rank can only distill the ADC pool, never hurt it
    assert r_rer >= r_adc, (r_rer, r_adc)
    assert r_rer >= 0.5, r_rer  # observed 0.66 on this corpus; margin for regen


def test_rerank_scores_are_exact_cosines(duck):
    """Every re-ranked hit's score must equal the true cosine — the re-rank
    stage may only reorder/filter the pool, not approximate."""
    rows = duck.execute(pq_rerank_sql(DUCKDB)).fetchall()
    assert rows
    for q, n, score, _rk in rows:
        true = duck.execute(
            "SELECT round(list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) "
            "FROM embeddings a, embeddings b WHERE a.vec_id = ? AND b.vec_id = ?",
            [q, n],
        ).fetchone()[0]
        assert abs(score - true) < 1e-9, (q, n, score, true)
