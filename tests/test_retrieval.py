"""Retrieval operators (operators/retrieval.py).

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin the
BM25 math against an independent python reference and the structural
invariants of the keyword / novelty outputs.
"""

from __future__ import annotations

import math
import re

from serene_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_TOP_K,
    TFIDF_TOP_K,
)
from serene_spark.registry import load_all


def _tokenize(text: str) -> list[str]:
    # same normalization as tokens_rel: lower, collapse ws, split non-alnum
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _docs(spark, sf_dir):
    return {
        int(r["doc_id"]): _tokenize(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


def _bm25_reference(docs: dict[int, list[str]]) -> dict[int, float]:
    k1, b = 1.2, 0.75
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores: dict[int, float] = {}
    for term in BM25_QUERY:
        df = sum(1 for toks in docs.values() if term in toks)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for doc_id, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            contrib = idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + round(contrib, 9)
    return scores


def test_bm25_matches_python_reference(spark, sf_dir):
    q = load_all()["bm25_search"]
    rows = q.spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    ref = _bm25_reference(_docs(spark, sf_dir))
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [(r["doc_id"], r["bm25"]) for r in sorted(rows, key=lambda r: r["rank"])]
    for (exp_id, exp_score), (got_id, got_score) in zip(expected, got):
        assert got_id == exp_id
        assert abs(got_score - exp_score) < 1e-5
    # ranks are 1..k dense and descending in score
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )


def test_bm25_matched_term_counts(spark, sf_dir):
    q = load_all()["bm25_search"]
    docs = _docs(spark, sf_dir)
    for r in q.spark(spark, sf_dir).collect():
        present = sum(1 for t in BM25_QUERY if t in docs[r["doc_id"]])
        assert r["n_terms_matched"] == present > 0


def test_tfidf_top_terms_shape(spark, sf_dir):
    q = load_all()["tfidf_top_terms"]
    rows = q.spark(spark, sf_dir).collect()
    docs = _docs(spark, sf_dir)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)  # every document gets keywords
    n = len(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOP_K
        # scores weakly decreasing, terms actually in the doc
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r["term"] in docs[doc_id]
    # spot-check the top keyword of one doc against python tf-idf
    doc_id = min(docs)
    df = {t: sum(1 for toks in docs.values() if t in toks)
          for t in set(docs[doc_id])}
    ref = {
        t: round(docs[doc_id].count(t) * math.log(n / df[t]), 6)
        for t in set(docs[doc_id])
    }
    best = min(sorted(ref, key=lambda t: (-ref[t], t))[:1])
    assert by_doc[doc_id][0]["term"] == best


def test_ngram_novelty_invariants(spark, sf_dir):
    q = load_all()["ngram_novelty"]
    rows = {r["source"]: r for r in q.spark(spark, sf_dir).collect()}
    assert rows
    first = min(rows, key=lambda s: (len(s), s))  # shortlex-first source
    assert rows[first]["novelty"] == 1.0  # everything is new to the first
    for r in rows.values():
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_grams"]
    # each distinct gram is novel in exactly one source: sum of novel counts
    # == corpus-wide distinct (source-attributed first) grams
    total_novel = sum(r["n_novel"] for r in rows.values())
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.curation import grams_rel

    register_views(spark, sf_dir, ("documents",))
    n_distinct = spark.sql(
        f"WITH {grams_rel(SPARK)} SELECT COUNT(DISTINCT gram) AS n FROM grams"
    ).collect()[0]["n"]
    assert total_novel == n_distinct
