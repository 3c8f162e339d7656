"""Sequence packing (operators/packing.py). Oracle parity runs in the
driver gate; these pin the packing invariants against an independent
python reference."""

from __future__ import annotations

from serene_spark.operators.packing import SEQ_LEN
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_manifest_invariants_and_python_reference(spark):
    rows = load_all()["sequence_pack_manifest"].spark(spark, SF).collect()
    assert rows
    # per shard: offsets are a gapless concatenation in doc_id order
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            assert r.start_off == off, (shard, r.doc_id)
            assert r.first_seq == off // SEQ_LEN
            assert r.last_seq == (off + r.n_tokens - 1) // SEQ_LEN
            assert r.n_seqs_spanned == r.last_seq - r.first_seq + 1
            off += r.n_tokens
    # a document longer than SEQ_LEN must span >= 2 sequences
    for r in rows:
        if r.n_tokens > SEQ_LEN:
            assert r.n_seqs_spanned >= 2


def test_stats_consistent_with_manifest(spark):
    manifest = load_all()["sequence_pack_manifest"].spark(spark, SF).collect()
    stats = load_all()["sequence_pack_stats"].spark(spark, SF).collect()
    by_shard = {r.shard: r for r in stats}
    agg: dict[int, dict] = {}
    for r in manifest:
        a = agg.setdefault(r.shard, {"docs": 0, "tokens": 0, "cross": 0})
        a["docs"] += 1
        a["tokens"] += r.n_tokens
        a["cross"] += 1 if r.n_seqs_spanned > 1 else 0
    assert set(agg) == set(by_shard)
    for shard, a in agg.items():
        s = by_shard[shard]
        assert s.n_docs == a["docs"]
        assert s.total_tokens == a["tokens"]
        assert s.n_boundary_docs == a["cross"]
        n_seq = -(-a["tokens"] // SEQ_LEN)
        assert s.n_sequences == n_seq
        assert s.pad_tokens == n_seq * SEQ_LEN - a["tokens"]
        assert s.pad_tokens < SEQ_LEN  # padding only at the shard tail
        assert abs(s.pack_efficiency - a["tokens"] / (n_seq * SEQ_LEN)) < 1e-6


def test_shard_count_scales_with_corpus():
    """The shard count is derived in-query from total tokens (floor 16,
    ~1M-token target shards) — the scale-knob discipline: at test sf the
    floor binds; the SQL itself carries the scaling rule."""
    from serene_spark.operators.packing import (
        MIN_SHARDS,
        TOKENS_PER_SHARD,
        pack_stats_sql,
    )
    from serene_spark.functions.sqlgen import SPARK

    sql = pack_stats_sql(SPARK)
    assert f"GREATEST({MIN_SHARDS}" in sql
    assert str(TOKENS_PER_SHARD) in sql


def test_corpus_build_composes_select_and_pack(spark, sf_dir):
    """The end-to-end manifest must contain exactly corpus_select's
    keepers, and each shard's offsets must be a gapless cumsum in doc_id
    order — the two standalone contracts surviving composition."""
    from serene_spark.registry import load_all

    qs = load_all()
    sel = qs["corpus_select"].spark(spark, sf_dir).toPandas()
    got = qs["corpus_build_manifest"].spark(spark, sf_dir).toPandas()

    assert set(got.doc_id) == set(sel.doc_id)
    lang = dict(zip(sel.doc_id, sel.pred_lang))
    assert all(lang[d] == p for d, p in zip(got.doc_id, got.pred_lang))

    for _, grp in got.groupby("shard"):
        grp = grp.sort_values("doc_id")
        expect_off = 0
        for _, r in grp.iterrows():
            assert r.start_off == expect_off
            assert r.first_seq == r.start_off // 256
            assert r.last_seq == (r.start_off + r.n_tokens - 1) // 256
            expect_off += r.n_tokens


def test_epoch_shuffle_plan_properties(spark):
    """Every epoch must cover every nonzero-token document exactly once,
    be deterministic across runs, and actually DECORRELATE epochs (the
    same-block share sits near 1/n_blocks, nowhere near 1)."""
    import math

    from serene_spark.operators.packing import DOCS_PER_BLOCK, N_EPOCHS

    qs = load_all()
    plan = qs["epoch_shuffle_plan"].spark(spark, SF).collect()
    epochs = {r["epoch"] for r in plan}
    assert epochs == set(range(N_EPOCHS))
    per_epoch_docs = {}
    for r in plan:
        per_epoch_docs[r["epoch"]] = per_epoch_docs.get(r["epoch"], 0) + r["n_docs"]
        assert r["n_docs"] > 0 and r["block_tokens"] > 0
        assert r["first_key"] <= r["last_key"]
    # all epochs cover the identical document population
    assert len(set(per_epoch_docs.values())) == 1
    n_docs = per_epoch_docs[0]
    n_blocks = max(1, math.ceil(n_docs / DOCS_PER_BLOCK))
    # binomial block sizes: every block within a loose factor of target
    for r in plan:
        assert r["n_docs"] <= DOCS_PER_BLOCK * 3

    # determinism: the plan is a pure function of (corpus, epoch)
    again = qs["epoch_shuffle_plan"].spark(spark, SF).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, again))

    audit = qs["epoch_shuffle_audit"].spark(spark, SF).collect()
    assert len(audit) == N_EPOCHS * (N_EPOCHS - 1) // 2
    for r in audit:
        assert r["n_docs"] == n_docs
        # decorrelated: same-block share within 3 sigma of 1/n_blocks
        p = 1.0 / n_blocks
        sigma = math.sqrt(p * (1 - p) / n_docs)
        assert abs(r["same_block_share"] - p) < 3.5 * sigma + 1e-9, r
        assert r["balance_max_over_mean"] < 3.0


def test_epoch_shuffle_block_count_ignores_zero_token_docs(spark):
    """blk_cfg must size blocks from the SAME population the assignment
    covers (n_tokens > 0). With zero-token docs in the corpus, counting
    them would overshoot n_blocks and leave every block systematically
    under-full vs DOCS_PER_BLOCK — this corpus is 2/3 empty docs, so the
    pre-fix derivation would plan 3x the blocks."""
    import math

    from serene_spark.operators.packing import (
        DOCS_PER_BLOCK,
        N_EPOCHS,
        epoch_shuffle_plan_sql,
    )

    n_real, n_empty = 220, 440
    rows = [(i, f"doc {i} has real token content number {i}") for i in range(n_real)]
    rows += [(n_real + j, "   ") for j in range(n_empty)]  # tokenizes to zero
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        plan = spark.sql(epoch_shuffle_plan_sql("spark")).collect()
    finally:
        spark.catalog.dropTempView("documents")
    expected_blocks = math.ceil(n_real / DOCS_PER_BLOCK)  # 3, not 7
    for e in range(N_EPOCHS):
        epoch_rows = [r for r in plan if r["epoch"] == e]
        assert len(epoch_rows) == expected_blocks, (e, len(epoch_rows))
        assert sum(r["n_docs"] for r in epoch_rows) == n_real
