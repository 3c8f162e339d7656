"""Behavior pins for the boilerplate-removal / segment-dedup operators.

Engine equivalence is covered by test_oracle_parity (both queries carry
oracles); these pin the SEMANTICS on the DuckDB side.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import DUCKDB
from serene_spark.operators.boilerplate import (
    SEG_W,
    boilerplate_strip_sql,
    segment_dedup_sql,
    segments_rel,
)


def test_segments_cover_every_token_once(duck):
    rows = duck.execute(
        f"""
WITH {segments_rel(DUCKDB)}
SELECT s.doc_id,
       SUM(len(string_split(s.seg, ' '))) AS seg_tokens,
       MIN(t.n_toks) AS n_toks,
       COUNT(*) AS n_segs
FROM segments s
JOIN (SELECT doc_id, len(list_filter(string_split_regex(
        trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')),
        '[^a-z0-9]+'), x -> x <> '')) AS n_toks FROM documents) t
  ON s.doc_id = t.doc_id
GROUP BY s.doc_id
"""
    ).fetchall()
    assert rows
    for _doc, seg_tokens, n_toks, n_segs in rows:
        assert seg_tokens == n_toks  # partition: no token lost or repeated
        assert n_segs == -(-n_toks // SEG_W)  # ceil(n / W)


def test_boilerplate_strip_counts_and_reconstruction(duck):
    rows = duck.execute(boilerplate_strip_sql(DUCKDB)).fetchall()
    assert len(rows) == duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_boiler_total = 0
    for _doc, n_segments, n_boiler, ratio, kept_text in rows:
        assert 0 <= n_boiler <= n_segments
        n_boiler_total += n_boiler
        assert abs(ratio - n_boiler / n_segments) < 1e-6
        # reconstruction: kept_text word count == kept segments * W (up to
        # the short tail segment)
        kept_words = len(kept_text.split()) if kept_text else 0
        kept_segs = n_segments - n_boiler
        assert kept_words <= kept_segs * SEG_W
        assert kept_words > (kept_segs - 1) * SEG_W - SEG_W or kept_segs == 0
    # the tiny-vocabulary corpus must produce SOME cross-doc repeats
    assert n_boiler_total > 0


def test_segment_dedup_first_occurrence_global_invariant(duck):
    rows = duck.execute(segment_dedup_sql(DUCKDB)).fetchall()
    total_segs = sum(r[1] for r in rows)
    total_dups = sum(r[2] for r in rows)
    distinct = duck.execute(
        f"WITH {segments_rel(DUCKDB)} SELECT COUNT(DISTINCT fp) FROM segments"
    ).fetchone()[0]
    # every non-first occurrence is a dup: distinct + dups == total
    assert distinct + total_dups == total_segs
    assert total_dups > 0  # the corpus repeats segments across docs
    # the lowest doc_id containing any duplicated fp keeps its copy: doc 0's
    # first segment can never be a dup of a later doc
    by_doc = {r[0]: r for r in rows}
    first_doc = min(by_doc)
    assert by_doc[first_doc][2] < by_doc[first_doc][1]
