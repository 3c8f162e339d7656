"""Two-drain pin for the streaming incremental-dedup sink: the persisted
fingerprint index must contain exactly one row per distinct normalized text,
first occurrence wins, across file arrivals AND query restarts."""

from __future__ import annotations

import pandas as pd


def _write_docs(path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(path)


def test_two_drain_index_is_first_occurrence_unique(spark, tmp_path):
    from serene_spark.streaming.incremental_dedup import start_incremental_dedup

    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    index_dir = str(tmp_path / "fp_index")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: docs 0-9; 8 and 9 duplicate 0 and 1's text (within-batch dups)
    texts1 = [f"alpha beta {i}" for i in range(8)] + ["alpha beta 0", "alpha beta 1"]
    _write_docs(
        docs_dir / "a.parquet",
        [(i, t, "en", "src1", len(t)) for i, t in enumerate(texts1)],
    )
    q = start_incremental_dedup(spark, str(docs_dir), index_dir, ckpt)
    assert q.awaitTermination(300)  # availableNow self-terminates; False = timeout

    idx1 = spark.read.parquet(index_dir).collect()
    assert len(idx1) == 8  # 10 docs, 2 within-batch dups dropped
    assert {r["doc_id"] for r in idx1} == set(range(8))  # lowest doc_id kept

    # batch 2 (new file, SAME checkpoint -> new epoch): docs 100-109;
    # 100-104 repeat batch-1 texts (cross-batch dups), 105-109 are new
    texts2 = [f"alpha beta {i}" for i in range(5)] + [f"gamma delta {i}" for i in range(5)]
    _write_docs(
        docs_dir / "b.parquet",
        [(100 + i, t, "en", "src2", len(t)) for i, t in enumerate(texts2)],
    )
    q = start_incremental_dedup(spark, str(docs_dir), index_dir, ckpt)
    assert q.awaitTermination(300)

    idx2 = spark.read.parquet(index_dir).collect()
    fps = [r["fp"] for r in idx2]
    assert len(fps) == len(set(fps))  # index is globally unique on fp
    assert len(idx2) == 13  # 8 from batch 1 + 5 genuinely new
    # cross-batch dups kept their FIRST (batch-1) doc_id
    kept = {r["doc_id"] for r in idx2}
    assert set(range(8)).issubset(kept)
    assert {105, 106, 107, 108, 109}.issubset(kept)
    assert not ({100, 101, 102, 103, 104} & kept)
