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


def test_index_compaction_preserves_fp_set_and_future_batches(spark, tmp_path):
    """compact_index collapses the per-epoch partitions to ONE while
    preserving the exact (fp, doc_id, source) set; a batch arriving
    AFTER compaction anti-joins against the compacted index identically
    (no duplicate fps, first occurrence still wins); re-run is a no-op."""
    from serene_spark.streaming.incremental_dedup import (
        compact_index,
        start_incremental_dedup,
    )

    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    index_dir = str(tmp_path / "fp_index")
    ckpt = str(tmp_path / "ckpt")

    for wave, texts in enumerate(
        ([f"alpha beta {i}" for i in range(6)],
         [f"alpha beta {i}" for i in range(3)] + [f"gamma {i}" for i in range(3)])
    ):
        _write_docs(
            docs_dir / f"w{wave}.parquet",
            [(wave * 100 + i, t, "en", f"s{wave}", len(t))
             for i, t in enumerate(texts)],
        )
        q = start_incremental_dedup(spark, str(docs_dir), index_dir, ckpt)
        assert q.awaitTermination(300)

    before = sorted(
        (r["fp"], r["doc_id"], r["source"])
        for r in spark.read.parquet(index_dir).collect()
    )
    n_epochs = spark.read.parquet(index_dir).select("epoch").distinct().count()
    assert n_epochs >= 2

    assert compact_index(spark, index_dir) == n_epochs
    post = spark.read.parquet(index_dir)
    assert post.select("epoch").distinct().count() == 1
    after = sorted(
        (r["fp"], r["doc_id"], r["source"]) for r in post.collect()
    )
    assert after == before  # exact row set preserved
    assert compact_index(spark, index_dir) == 0  # idempotent no-op

    # a third wave lands on the COMPACTED index: dups of wave-1/2 drop,
    # new texts survive — the anti-join contract unchanged
    _write_docs(
        docs_dir / "w2.parquet",
        [(300, "alpha beta 0", "en", "s2", 12),   # dup of doc 0
         (301, "epsilon zeta", "en", "s2", 12)],  # new
    )
    q = start_incremental_dedup(spark, str(docs_dir), index_dir, ckpt)
    assert q.awaitTermination(300)
    final = spark.read.parquet(index_dir)
    fps = [r["fp"] for r in final.collect()]
    assert len(fps) == len(set(fps)) == len(before) + 1
    kept = {r["doc_id"] for r in final.collect()}
    assert 301 in kept and 300 not in kept and 0 in kept
