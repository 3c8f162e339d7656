"""Exact-substring dedup (operators/substring_dedup.py).

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin the
semantics on INJECTED duplicates with known overlap geometry.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.substring_dedup import (
    K_GRAM,
    MAX_DF,
    substring_pairs_sql,
    substring_stats_sql,
)


def _run(spark, docs):
    """docs: list of (doc_id, text) -> pairs rows via a temp documents view."""
    spark.createDataFrame(docs, "doc_id string, text string").createOrReplaceTempView(
        "documents"
    )
    try:
        pairs = spark.sql(substring_pairs_sql(SPARK)).collect()
        stats = spark.sql(substring_stats_sql(SPARK)).collect()[0]
    finally:
        spark.catalog.dropTempView("documents")
    return pairs, stats


def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_injected_overlap_detected_with_exact_length(spark):
    """Two documents sharing an exact 30-token run embedded at different
    offsets -> one pair whose max_overlap_tokens == 30."""
    shared = _words("dup", 30)
    docs = [
        ("a", _words("ax", 20) + " " + shared + " " + _words("ay", 15)),
        ("b", shared + " " + _words("bz", 40)),
        ("c", _words("cq", 60)),  # no overlap with anyone
    ]
    pairs, stats = _run(spark, docs)
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b) == ("a", "b")
    assert p.max_overlap_tokens == 30
    # 30-token run = 30 - K + 1 consecutive grams, one maximal run
    assert p.n_shared_grams == 30 - K_GRAM + 1
    assert p.n_runs == 1
    assert stats.n_docs_with_overlap == 2
    assert stats.n_common_grams_dropped == 0


def test_below_threshold_overlap_not_reported(spark):
    """A shared run shorter than K_GRAM tokens must produce no pair."""
    shared = _words("dup", K_GRAM - 1)
    docs = [
        ("a", _words("ax", 25) + " " + shared),
        ("b", shared + " " + _words("bz", 25)),
    ]
    pairs, _stats = _run(spark, docs)
    assert pairs == []


def test_two_separate_runs_counted(spark):
    """Two disjoint shared runs on different diagonals -> n_runs == 2 and
    max_overlap_tokens == the longer run."""
    run1, run2 = _words("one", 15), _words("two", 20)
    docs = [
        ("a", run1 + " " + _words("mid", 18) + " " + run2),
        ("b", run2 + " " + _words("oth", 22) + " " + run1),
    ]
    pairs, _stats = _run(spark, docs)
    assert len(pairs) == 1
    p = pairs[0]
    assert p.n_runs == 2
    assert p.max_overlap_tokens == 20
    assert p.n_shared_grams == (15 - K_GRAM + 1) + (20 - K_GRAM + 1)


def test_common_gram_cap_logged_not_silent(spark):
    """A gram present in more than MAX_DF documents is dropped from pairing
    AND surfaces in n_common_grams_dropped — the no-silent-caps rule."""
    boiler = _words("cookie", K_GRAM)  # exactly one gram worth of boilerplate
    docs = [(f"d{i}", boiler + " " + _words(f"u{i}", 20)) for i in range(MAX_DF + 2)]
    pairs, stats = _run(spark, docs)
    assert pairs == []  # the only cross-doc gram was capped away
    assert stats.n_common_grams_dropped == 1
    assert stats.n_cross_doc_grams >= 1


def test_normalization_case_and_punct_insensitive(spark):
    """NORM lowercases and strips punctuation: duplicates that differ only
    in case/punctuation still match exactly."""
    base = _words("tok", 2 * K_GRAM)
    docs = [
        ("a", base),
        ("b", base.upper().replace(" ", ", ")),
    ]
    pairs, _stats = _run(spark, docs)
    assert len(pairs) == 1
    assert pairs[0].max_overlap_tokens == 2 * K_GRAM
