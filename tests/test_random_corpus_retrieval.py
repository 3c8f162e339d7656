"""Random-corpus python twins for the retrieval tier.

``bm25_search`` (Okapi BM25, Lucene non-negative idf) and
``tfidf_top_terms`` previously had rank-order laws only; here their FULL
outputs — scores, match counts, ranks — are recomputed from scratch with
python math/collections on 3 seeded corpora in which the fixed query
terms appear at varied frequencies (plus query-term-free and token-free
docs, so the posting/df edges are real).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from serene_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_TOP_K,
    TFIDF_TOP_K,
)
from serene_spark.registry import load_all

SEEDS = (7, 23, 91)
K1, B = 1.2, 0.75

_FILLER = ["data", "table", "rows", "merge", "column", "plan", "query",
           "window", "batch", "stream", "join42", "x9"]


def _make_docs(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 6000)
    texts = []
    for i in range(40):
        n = int(rng.integers(5, 60))
        words = list(rng.choice(_FILLER, size=n))
        # query terms at geometric-ish frequency: some docs dense, many
        # sparse, some with none
        for t in BM25_QUERY:
            reps = int(rng.integers(0, 5)) if i % 3 else 0
            words += [t] * reps
        rng.shuffle(words)
        texts.append(" ".join(words))
    texts.append("SPARK  Broadcast,shuffle;spark!")  # norm/split edges
    texts.append("")                                 # token-free doc
    texts.append("!!! ???")                          # tokens all dropped
    return pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": [f"src{i % 3}" for i in range(len(texts))],
        "n_chars": [len(t) for t in texts],
    })


def _tokens(text: str) -> list[str]:
    norm = re.sub(r"[ \t\n\r]+", " ", text.lower()).strip(" ")
    return [t for t in re.split(r"[^a-z0-9]+", norm) if t]


@pytest.fixture(scope="module")
def retr_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("randretr")
    made: dict[int, str] = {}

    def get(seed: int) -> str:
        if seed not in made:
            d = root / f"seed{seed}"
            d.mkdir()
            _make_docs(seed).to_parquet(str(d / "documents.parquet"), index=False)
            made[seed] = str(d)
        return made[seed]

    return get


@pytest.mark.parametrize("seed", SEEDS)
def test_bm25_vs_python(spark, retr_sf, seed):
    docs = _make_docs(seed)
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    dl = {d: len(t) for d, t in toks.items() if t}   # doc_len drops empty
    n_docs, total_len = len(dl), sum(dl.values())
    df = {q: sum(1 for t in toks.values() if q in t) for q in BM25_QUERY}
    assert 0 < min(df.values()) and max(df.values()) < n_docs  # real idf spread

    scored = []
    for d, ts in toks.items():
        tf = Counter(t for t in ts if t in BM25_QUERY)
        if not tf:
            continue
        score = 0.0
        for q, f in tf.items():
            idf = math.log(1 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            norm = f * (K1 + 1) / (
                f + K1 * (1 - B + B * dl[d] * n_docs / total_len))
            score += round(idf * norm, 9)            # DECIMAL(18,9) contrib
        scored.append((d, len(tf), round(score, 6)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = pd.DataFrame(
        [(d, m, s, i + 1) for i, (d, m, s) in enumerate(scored[:BM25_TOP_K])],
        columns=["doc_id", "n_terms_matched", "bm25", "rank"])

    got = (load_all()["bm25_search"].spark(spark, retr_sf(seed)).toPandas()
           .sort_values("rank").reset_index(drop=True))
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.n_terms_matched.values == want.n_terms_matched.values).all()
    assert (got["rank"].values == want["rank"].values).all()
    np.testing.assert_allclose(got.bm25, want.bm25, rtol=0, atol=1.5e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_tfidf_top_terms_vs_python(spark, retr_sf, seed):
    docs = _make_docs(seed)
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    tf = {d: Counter(t) for d, t in toks.items() if t}
    n = len(tf)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    rows = []
    for d, c in tf.items():
        terms = sorted(
            ((round(f * math.log(n / df[t]), 6), t) for t, f in c.items()),
            key=lambda x: (-x[0], x[1]))
        for i, (v, t) in enumerate(terms[:TFIDF_TOP_K]):
            rows.append((d, t, v, i + 1))
    want = (pd.DataFrame(rows, columns=["doc_id", "term", "tfidf", "rank"])
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))

    got = (load_all()["tfidf_top_terms"].spark(spark, retr_sf(seed)).toPandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.term.values == want.term.values).all()
    assert (got["rank"].values == want["rank"].values).all()
    np.testing.assert_allclose(got.tfidf, want.tfidf, rtol=0, atol=1.5e-6)
