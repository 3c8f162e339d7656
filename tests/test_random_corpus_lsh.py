"""Random-corpus independent python twin for the minhash-LSH pipeline.

The headline dedup operator's end-to-end arithmetic — normalization →
char-8 shingles → 48-permutation double-hash minhash → 16×3 band md5
signatures → bucket candidate pairs → estimated/exact Jaccard — is
recomputed here from scratch with hashlib/re/itertools: no SQL, no
sqlgen shims, no DuckDB. On 3 seeded corpora with PLANTED near-dups the
twin must reproduce, exactly:

* the full minhash signature matrix (``minhash_signatures``, 16 perms),
* the LSH candidate-pair set AND per-pair estimated Jaccard
  (``dedup_minhash_lsh``, 48 perms, planner default 16×3 geometry —
  below PLANNER_MIN_DOCS the planner is a documented no-op),
* the exact-verified survivor set AND per-pair exact shingle Jaccard
  (``dedup_lsh_verified``, threshold 0.2).

Before round 12 only the sim=1.0 content-twin law pinned this pipeline
independently; a shared-SQL bug in the band/permutation arithmetic could
pass Spark-vs-DuckDB parity by construction — it cannot pass this twin.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from serene_spark.operators.dedup import (
    BAND_SIZE,
    LSH_BUCKET_CAP,
    MH_PRIME,
    N_LSH,
    N_MINHASH,
    SHINGLE_K,
)
from serene_spark.registry import load_all

SEEDS = (7, 23, 91)

_VOCAB = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
          "oscar", "papa", "quebec", "romeo", "sierra", "tango"]


def _make_docs(seed: int) -> pd.DataFrame:
    """~50 docs: random base texts plus PLANTED near-dup partners (a few
    words swapped — char-shingle Jaccard lands mid-S-curve), one exact-dup
    pair modulo case/whitespace, and two empty docs (the '' shingle)."""
    rng = np.random.default_rng(seed + 5000)
    texts = []
    for i in range(36):
        n = int(rng.integers(12, 30))
        texts.append(" ".join(rng.choice(_VOCAB, size=n)))
    for i in range(8):  # planted near-dups of docs 0..7
        words = texts[i].split()
        for _ in range(max(1, len(words) // 10)):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(_VOCAB))
        texts.append(" ".join(words))
    texts.append("  " + texts[3].upper().replace(" ", "  ") + " ")  # exact twin
    texts.append("")
    texts.append("   \t ")
    return pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": [f"src{i % 3}" for i in range(len(texts))],
        "n_chars": [len(t) for t in texts],
    })


# ----------------------------------------------------- from-scratch twin

def _norm(text: str) -> str:
    return re.sub(r"[ \t\n\r]+", " ", text.lower()).strip(" ")


def _shingles(norm: str) -> set:
    n_pos = max(1, len(norm) - SHINGLE_K + 1)
    return {norm[i:i + SHINGLE_K] for i in range(n_pos)}


def _signature(shingles: set, n_perm: int) -> list:
    mins = [None] * n_perm
    for sh in shingles:
        hx = hashlib.md5(sh.encode("utf-8")).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
        for i in range(n_perm):
            v = (h1 + i * h2) % MH_PRIME
            if mins[i] is None or v < mins[i]:
                mins[i] = v
    return mins


def _twin(docs: pd.DataFrame):
    """(signatures 16-perm, candidate pairs w/ est_jaccard 48-perm,
    verified pairs w/ exact jaccard) — pure python."""
    shs = {r.doc_id: _shingles(_norm(r.text)) for r in docs.itertuples()}
    sig16 = {d: _signature(s, N_MINHASH) for d, s in shs.items()}
    sig48 = {d: _signature(s, N_LSH) for d, s in shs.items()}

    n_bands = N_LSH // BAND_SIZE
    buckets = defaultdict(list)
    for d, sig in sig48.items():
        for b in range(n_bands):
            key = "|".join(str(sig[b * BAND_SIZE + j]) for j in range(BAND_SIZE))
            buckets[(b, hashlib.md5(key.encode()).hexdigest())].append(d)
    assert max(len(v) for v in buckets.values()) <= LSH_BUCKET_CAP  # no hot tier
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, d1 in enumerate(ms):
            for d2 in ms[i + 1:]:
                cand.add((d1, d2))

    est = {
        (d1, d2): round(
            sum(1 for i in range(N_LSH) if sig48[d1][i] == sig48[d2][i]) / N_LSH, 6)
        for d1, d2 in cand
    }
    verified = {}
    for d1, d2 in cand:
        c = len(shs[d1] & shs[d2])
        j = c / (len(shs[d1]) + len(shs[d2]) - c)
        if j >= 0.2:
            verified[(d1, d2)] = round(j, 6)
    return sig16, est, verified


# ------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def lsh_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("randlsh")
    made: dict[int, str] = {}

    def get(seed: int) -> str:
        if seed not in made:
            d = root / f"seed{seed}"
            d.mkdir()
            _make_docs(seed).to_parquet(str(d / "documents.parquet"), index=False)
            made[seed] = str(d)
        return made[seed]

    return get


def _pairs(df: pd.DataFrame, val_col: str) -> dict:
    return {(int(r.doc_id_1), int(r.doc_id_2)): float(getattr(r, val_col))
            for r in df.itertuples()}


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("seed", SEEDS)
def test_minhash_lsh_vs_python(spark, lsh_sf, seed):
    docs = _make_docs(seed)
    sig16, est, verified = _twin(docs)

    # corpus sanity: the planted structure is really there
    assert len(est) >= 9, "planted near-dups must surface as candidates"
    assert any(v == 1.0 for v in est.values()), "exact twin at est 1.0"
    assert any(0.2 <= v < 1.0 for v in verified.values()), "mid-curve dups"
    assert (3, 44) in verified and verified[(3, 44)] == 1.0  # case/ws twin

    qs = load_all()
    sf = lsh_sf(seed)

    # (1) full 16-perm signature matrix, value-exact
    got_sig = (qs["minhash_signatures"].spark(spark, sf).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
    assert len(got_sig) == len(docs)
    for r in got_sig.itertuples():
        assert [getattr(r, f"mh{i}") for i in range(N_MINHASH)] == \
            sig16[r.doc_id], f"doc {r.doc_id}"

    # (2) candidate set + estimated Jaccard, set- and value-exact
    got_est = _pairs(qs["dedup_minhash_lsh"].spark(spark, sf).toPandas(),
                     "est_jaccard")
    assert set(got_est) == set(est)
    for k in est:
        assert abs(got_est[k] - est[k]) < 1.5e-6, k

    # (3) verified survivor set + exact shingle Jaccard
    got_ver = _pairs(qs["dedup_lsh_verified"].spark(spark, sf).toPandas(),
                     "jaccard")
    assert set(got_ver) == set(verified)
    for k in verified:
        assert abs(got_ver[k] - verified[k]) < 1.5e-6, k
