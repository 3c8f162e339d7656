"""Persisted-IVF-index pins: search over the on-disk inverted lists must be
bit-identical to the inline similarity_ivf query, and the list scan must
prune partitions at planning time."""

from __future__ import annotations

from serene_spark.operators.ivf_index import build_ivf_index, search_ivf_index


def test_index_search_matches_inline_query_and_prunes(spark, sf_dir, tmp_path):
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    index_path = str(tmp_path / "ivf_index")
    build_ivf_index(spark, sf_dir, index_path)

    out = search_ivf_index(spark, sf_dir, index_path)
    got = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rk"])
        for r in out.collect()
    }

    inline = load_all()["similarity_ivf"].spark(spark, sf_dir)
    want = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rk"])
        for r in inline.collect()
    }
    assert got == want and got  # identical result sets, non-empty

    # the inverted-list scan must carry partition filters on centroid_id
    # (n_probe-of-k directories read, not the whole index)
    txt = plan_text(search_ivf_index(spark, sf_dir, index_path))
    assert "PartitionFilters" in txt
    seen_pf = [
        line for line in txt.splitlines()
        if "PartitionFilters" in line and "centroid_id" in line
    ]
    assert seen_pf, txt


def test_fewer_probes_is_subset_quality(spark, sf_dir, tmp_path):
    """n_probe=1 must return a (possibly worse) ranking whose candidates are
    a subset of the n_probe=4 candidate pool — the recall/cost knob."""
    index_path = str(tmp_path / "ivf_index2")
    build_ivf_index(spark, sf_dir, index_path)
    one = search_ivf_index(spark, sf_dir, index_path, n_probe=1).collect()
    four = search_ivf_index(spark, sf_dir, index_path, n_probe=4).collect()
    assert one and four
    # an n_probe=1 hit can only be displaced in the wider search by a BETTER
    # candidate, so each query's best hit never worsens with more probes
    top1_1 = {r["query_id"]: r["cosine"] for r in one if r["rk"] == 1}
    top1_4 = {r["query_id"]: r["cosine"] for r in four if r["rk"] == 1}
    for q, c in top1_1.items():
        assert top1_4.get(q, c) >= c  # more probes never worsen the best hit
