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
