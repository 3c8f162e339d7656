"""Vocabulary/embedding-audit operators (operators/vocab.py).

Oracle parity runs in the driver gate; these pin semantics against
independent python computations.
"""

from __future__ import annotations

import re as _re
from collections import Counter

import numpy as np

from serene_spark.operators.vocab import EMB_DIM, TOP_MERGES
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_bpe_top_merges_matches_python(spark):
    out = load_all()["bpe_top_merges"].spark(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    pairs: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in _re.split(r"[^a-z0-9]+", _re.sub(r"\s+", " ", text.lower()).strip()) if t]
        pairs.update(zip(toks, toks[1:]))
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    expect = ranked[:TOP_MERGES]
    assert len(out) == TOP_MERGES
    for row, ((l, r), c) in zip(out, expect):
        assert (row["left_tok"], row["right_tok"], row["pair_count"]) == (l, r, c)


def test_embedding_dim_stats_match_numpy(spark):
    out = load_all()["embedding_dim_stats"].spark(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    # micro-unit floor quantization, exactly as the operator defines
    q = np.floor(vecs * 1_000_000)
    assert len(out) == EMB_DIM
    for _, r in out.iterrows():
        col = q[:, int(r["dim"]) - 1]
        assert r["n"] == len(col)
        assert abs(r["mean"] - round(col.mean() / 1e6, 6)) < 1e-9
        assert abs(r["std"] - round(col.std(ddof=1) / 1e6, 6)) < 1e-6
        assert r["min_x"] == round(col.min() / 1e6, 6)
        assert r["max_x"] == round(col.max() / 1e6, 6)


def test_bpe_trainer_matches_python_reference(spark):
    """The full trainer's merge sequence equals a pure-python Sennrich BPE
    (same normalization, same (count DESC, pair ASC) tie-break), merge for
    merge, and the merged vocab segments accordingly."""
    import collections
    import re

    from serene_spark.operators.vocab import EOW, bpe_train

    merges, vocab = bpe_train(spark, SF, n_merges=15)
    assert len(merges) == 15

    # pure-python reference off the same parquet
    import duckdb

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    freq = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if w:
                freq[w] += 1
    words = {w: list(w) + [EOW] for w in freq}

    ref_merges = []
    for _ in range(15):
        pairs = collections.Counter()
        for w, syms in words.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        ref_merges.append((l, r, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    assert merges == ref_merges, (merges[:5], ref_merges[:5])
    # merged vocab agrees for a sample of words
    sample = vocab.orderBy("word").limit(20).collect()
    for r in sample:
        assert r["syms"] == words[r["word"]], r["word"]


def test_embedding_sq8_audit_numpy_reference(spark, sf_dir):
    """SQ8 codes and errors recomputed in numpy micro-unit space; the
    round-to-nearest bound step/2 must hold on every dimension."""
    import numpy as np

    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    out = (
        load_all()["embedding_sq8_audit"].spark(spark, sf_dir).toPandas()
        .sort_values("dim").reset_index(drop=True)
    )
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    mat = np.array(emb["embedding"].tolist(), dtype=np.float32).astype(np.float64)
    micro = np.floor(mat * 1_000_000).astype(np.int64)

    assert (out["within_bound"] == 1).all()
    for _, r in out.iterrows():
        x = micro[:, int(r["dim"]) - 1]
        lo, hi = int(x.min()), int(x.max())
        rng = hi - lo
        assert abs(r["min_x"] - round(lo / 1e6, 6)) < 1e-9
        assert abs(r["max_x"] - round(hi / 1e6, 6)) < 1e-9
        if rng == 0:
            assert r["rms_err"] == 0.0
            continue
        code = (2 * 255 * (x - lo) + rng) // (2 * rng)
        assert r["min_code"] == code.min() and r["max_code"] == code.max()
        assert 0 <= code.min() and code.max() <= 255
        err255 = 255 * (x - lo) - code * rng
        rms = np.sqrt((err255.astype(np.float64) ** 2).mean()) / (255.0 * 1e6)
        assert abs(r["rms_err"] - round(rms, 6)) < 2e-6
        assert abs(
            r["max_abs_err"] - round(np.abs(err255).max() / (255.0 * 1e6), 6)
        ) < 2e-6
        # the round-to-nearest guarantee, in exact integer space
        assert np.abs(err255).max() * 2 <= rng * 255 + 255


def test_pmi_collocations_match_python(spark):
    from serene_spark.operators.vocab import PMI_MIN_COUNT, PMI_TOP
    import math

    out = load_all()["pmi_collocations"].spark(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in _re.split(r"[^a-z0-9]+", _re.sub(r"\s+", " ", text.lower()).strip()) if t]
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    n_toks = sum(uni.values())
    n_pairs = sum(pairs.values())
    scored = []
    for (l, r), c in pairs.items():
        if c >= PMI_MIN_COUNT:
            pmi = round(math.log((c / n_pairs) / ((uni[l] / n_toks) * (uni[r] / n_toks))), 6)
            scored.append((-pmi, l, r, c))
    scored.sort()
    expect = scored[:PMI_TOP]
    assert len(out) == min(PMI_TOP, len(expect))
    for row, (neg_pmi, l, r, c) in zip(out, expect):
        assert (row["left_tok"], row["right_tok"], row["pair_count"]) == (l, r, c)
        assert abs(row["pmi"] - (-neg_pmi)) < 1e-5


def test_term_burstiness_matches_python(spark):
    out = load_all()["term_burstiness"].spark(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    per_doc: dict[str, list[int]] = {}
    nd = len(docs)
    for text in docs["text"]:
        toks = [t for t in _re.split(r"[^a-z0-9]+", _re.sub(r"\s+", " ", text.lower()).strip()) if t]
        for tok, c in Counter(toks).items():
            per_doc.setdefault(tok, []).append(c)
    scored = []
    for tok, cs in per_doc.items():
        if len(cs) < 10:
            continue
        s, q = sum(cs), sum(c * c for c in cs)
        mean = s / nd
        var = (q - s * s / nd) / (nd - 1)
        scored.append((-round(var / mean, 6), tok, len(cs), s))
    scored.sort()
    for row, (neg, tok, df, s) in zip(out, scored):
        assert (row["term"], row["doc_freq"], row["total_count"]) == (tok, df, s)
        assert abs(row["burstiness_vmr"] - (-neg)) < 1e-5


def test_ppmi_spectral_matches_numpy_power_iteration(spark, sf_dir):
    """The spectral embedding re-derived independently: numpy builds the
    same PPMI matrix from raw token streams and replicates the rounded
    power iteration bit-for-bit; the UNrounded dominant eigenvector must
    also align (the 9-dp rounding is bookkeeping, not a different answer)."""
    import math
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd

    from serene_spark.operators.vocab import (
        SPEC_ITERS,
        SPEC_MIN_COUNT,
        SPEC_VOCAB,
    )
    from serene_spark.registry import load_all

    got = load_all()["ppmi_spectral_embedding"].spark(spark, sf_dir).toPandas()
    got["spectral"] = got["spectral"].astype(float)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni: Counter = Counter()
    pair: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in re.split(r"[^a-z0-9]+", str(text).lower()) if t]
        uni.update(toks)
        pair.update(zip(toks, toks[1:]))

    vocab = sorted(
        (t for t, c in uni.items() if c >= SPEC_MIN_COUNT),
        key=lambda t: (-uni[t], t),
    )[:SPEC_VOCAB]
    idx = {t: i for i, t in enumerate(vocab)}
    sym: Counter = Counter()
    for (a, b), c in pair.items():
        if a in idx and b in idx:
            sym[(a, b)] += c
            sym[(b, a)] += c
    deg = Counter()
    for (a, _), c in sym.items():
        deg[a] += c
    n = sum(sym.values())
    M = np.zeros((len(vocab), len(vocab)))
    for (a, b), c in sym.items():
        ratio = (c * n) / (deg[a] * deg[b])
        if ratio > 1.0:
            M[idx[a], idx[b]] = round(math.log(ratio), 9)

    # replicate the rounded iteration exactly
    v = np.ones(len(vocab))
    for _ in range(SPEC_ITERS):
        r = np.array([round(x, 9) for x in
                      (np.round(M * v[None, :], 9)).sum(axis=1)])
        v = np.round(r / r.max(), 9)
    ref = pd.DataFrame({"tok": vocab, "v": v})
    merged = got.merge(ref, on="tok")
    assert len(merged) == len(got) == len(vocab)
    assert (merged.spectral - merged.v).abs().max() <= 1e-9

    # and the rounding is bookkeeping: cosine vs the true (unrounded)
    # dominant eigenvector after the same #iterations' worth of convergence
    w, V = np.linalg.eigh(M)
    top = np.abs(V[:, np.argmax(w)])
    cos = float(v @ top / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos >= 0.98, cos
