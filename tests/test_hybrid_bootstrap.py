"""RRF hybrid fusion, matryoshka recall audit, and the Poisson bootstrap
against independent python/numpy references at sf0.001."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _load_vecs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    ids = emb.vec_id.to_numpy()
    X = np.floor(
        np.stack(emb.embedding.to_numpy()).astype("float64") * 1_000_000
    ).astype("int64")
    order = np.argsort(ids)
    return ids[order], X[order]


def _tokens(text: str) -> list[str]:
    norm = re.sub(r"[ \t\n\r]+", " ", text.lower()).strip()
    return [t for t in re.split(r"[^a-z0-9]+", norm) if t]


def test_rrf_matches_python(spark):
    out = load_all()["hybrid_rrf_search"].spark(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    ids, X = _load_vecs(spark)

    # lexical ranker: tf * ln(N/df) over the query terms
    q_terms = ("spark", "shuffle", "broadcast")
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    n_docs = len(toks)
    tf = {(t, d): toks[d].count(t) for d in toks for t in q_terms if t in toks[d]}
    df = {t: sum(1 for d in toks if (t, d) in tf) for t in q_terms}
    lex_scores = {}
    for (t, d), c in tf.items():
        lex_scores[d] = lex_scores.get(d, 0.0) + round(c * math.log(n_docs / df[t]), 9)
    lex_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(lex_scores.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }

    # semantic ranker: cosine to the min-vec_id query over quantized ints
    q = X[0]
    dots = X @ q
    nrm = (X * X).sum(axis=1)
    cos = np.round(dots / np.sqrt(nrm.astype("float64") * (q @ q)), 9)
    cand = [(float(-cos[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != ids[0]]
    cand.sort()
    sem_rank = {d: i + 1 for i, (_, d) in enumerate(cand)}

    fused = {}
    for d, r in lex_rank.items():
        if r <= 50:
            fused[d] = fused.get(d, 0.0) + 1 / (60 + r)
    for d, r in sem_rank.items():
        if r <= 50:
            fused[d] = fused.get(d, 0.0) + 1 / (60 + r)
    want = sorted(fused.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]

    assert len(out) == 10
    for i, (_, r) in enumerate(out.sort_values("pos").iterrows()):
        d, score = want[i]
        assert r["doc_id"] == d
        assert abs(r["rrf_score"] - round(round(score, 9), 6)) < 1e-9
        got_lex = None if np.isnan(r["rank_lex"]) else int(r["rank_lex"])
        got_sem = None if np.isnan(r["rank_sem"]) else int(r["rank_sem"])
        assert got_lex == (lex_rank.get(d) if lex_rank.get(d, 99) <= 50 else None)
        assert got_sem == (sem_rank.get(d) if sem_rank.get(d, 99) <= 50 else None)


def test_matryoshka_matches_numpy(spark):
    out = load_all()["matryoshka_recall"].spark(spark, SF).toPandas()
    ids, X = _load_vecs(spark)
    queries = ids[:10]

    def topk(kd, qi):
        d = X[:, :kd] @ X[qi, :kd]
        cand = [(int(-d[i]), int(ids[i])) for i in range(len(ids)) if i != qi]
        cand.sort()
        return {c for _, c in cand[:10]}

    truth = {qi: topk(64, qi) for qi in range(10)}
    got = {int(r.dims_kept): r for r in out.itertuples()}
    assert set(got) == {8, 16, 32, 64}
    for kd in (8, 16, 32, 64):
        recalls = [len(topk(kd, qi) & truth[qi]) / 10 for qi in range(10)]
        assert abs(got[kd].mean_recall - round(sum(recalls) / 10, 6)) < 1e-9
        assert abs(got[kd].min_recall - round(min(recalls), 6)) < 1e-9
        assert got[kd].n_queries == 10
    # full dimension is its own ground truth; recall degrades monotonically
    assert got[64].mean_recall == 1.0 and got[64].min_recall == 1.0
    assert got[8].mean_recall <= got[16].mean_recall <= got[32].mean_recall <= 1.0


def _u01(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 4294967296.0


def test_bootstrap_matches_python(spark):
    from serene_spark.operators.bootstrap import _POIS_CDF, B_REPS

    row = load_all()["bootstrap_ci_revenue"].spark(spark, SF).collect()[0]
    od = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    revs = {int(k): round(v, 2) for k, v in zip(od.o_orderkey, od.o_totalprice)}

    def pois(u):
        for k, c in enumerate(_POIS_CDF):
            if u < c:
                return k
        return 7

    means = []
    for rep in range(1, B_REPS + 1):
        s = n = 0
        for k, v in revs.items():
            w = pois(_u01(f"{k}#{rep}"))
            s += w * v
            n += w
        means.append((round(round(s, 2) / n, 6), rep))
    means.sort()
    vals = [m for m, _ in means]
    assert row["n_reps"] == B_REPS
    assert row["ci_lo"] == vals[2]   # pos 3 = ceil(0.025*100)
    assert row["ci_hi"] == vals[97]  # pos 98 = ceil(0.975*100)
    assert abs(row["mean_rev"] - round(sum(revs.values()) / len(revs), 6)) < 1e-6
    b = len(vals)
    se = math.sqrt((sum(v * v for v in vals) - sum(vals) ** 2 / b) / (b - 1))
    assert abs(row["bootstrap_se"] - se) < 1e-5
    # the CI brackets the point estimate and has sane width
    assert row["ci_lo"] < row["mean_rev"] < row["ci_hi"]
    assert 2 * row["bootstrap_se"] < (row["ci_hi"] - row["ci_lo"]) < 6 * row["bootstrap_se"]
