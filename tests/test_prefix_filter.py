"""Prefix-filtered exact similarity join (operators/dedup.py).

The driver gate proves output == the naive quadratic join (that IS the
oracle).  These pin the pruning power — the property that makes the filter
a scale path — and the prefix-length math.
"""

from __future__ import annotations

import math

from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.dedup import (
    PF_THRESHOLD,
    prefix_filter_tail_sql,
    shingles_rel,
)
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _shingle_view(spark):
    from serene_spark.catalog import register_views

    register_views(spark, SF, ("documents",), spread=True)
    sh = spark.sql(f"WITH {shingles_rel(SPARK)} SELECT * FROM shingles").localCheckpoint(
        eager=True
    )
    sh.createOrReplaceTempView("__pf_t_shingles")
    return sh


def test_candidates_far_below_all_pairs(spark):
    sh = _shingle_view(spark)
    n_docs = sh.select("doc_id").distinct().count()
    tail = prefix_filter_tail_sql("__pf_t_shingles", SPARK)
    # everything through cand, trailing comma stripped
    cand_cte = tail.split("\ncommon AS")[0].rstrip().rstrip(",")
    n_cand = spark.sql("WITH " + cand_cte + "\nSELECT COUNT(*) AS c FROM cand").collect()[0]["c"]
    all_pairs = n_docs * (n_docs - 1) // 2
    # pruning on THIS corpus caps at ~2x — the synthetic docs share large
    # template chunks, so even rare shingles span the corpus (see the
    # operator docstring); the bound pins that the filter at least halves
    # the space here, and the containment check below plus the driver's
    # parity run pin the corpus-independent losslessness guarantee
    assert n_cand < 0.55 * all_pairs, (n_cand, all_pairs)
    # ...and every true pair is a candidate (containment, not just counts)
    out = load_all()["dedup_prefix_filter"].spark(spark, SF)
    true_pairs = {(r["doc_id_1"], r["doc_id_2"]) for r in out.collect()}
    cands = {
        (r["d1"], r["d2"])
        for r in spark.sql("WITH " + cand_cte + "\nSELECT d1, d2 FROM cand").collect()
    }
    assert true_pairs <= cands


def test_prefix_length_math(spark):
    """Prefix length must equal |X| - ceil(t|X|) + 1 for every doc."""
    _shingle_view(spark)
    tail = prefix_filter_tail_sql("__pf_t_shingles", SPARK)
    pre_cte = tail.split("\ncand AS")[0].rstrip().rstrip(",")
    rows = spark.sql(
        "WITH " + pre_cte + "\nSELECT doc_id, MAX(n_sh) AS n_sh, COUNT(*) AS plen "
        "FROM prefixes GROUP BY doc_id"
    ).collect()
    assert rows
    for r in rows:
        expect = r["n_sh"] - math.ceil(PF_THRESHOLD * r["n_sh"]) + 1
        assert r["plen"] == expect, (r["doc_id"], r["plen"], expect)
