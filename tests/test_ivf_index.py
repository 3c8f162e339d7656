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


def test_upsert_equals_union_build_with_frozen_centroids(spark, sf_dir, tmp_path):
    """Build on the first half, upsert the second: the index contents must
    be bit-identical to assigning the FULL corpus against the frozen
    half-built centroids (the assignment rule is shared, so this pins that
    upsert neither moves centroids nor mis-assigns)."""
    from serene_spark.functions.sqlgen import SPARK as SP
    from serene_spark.operators.ivf_index import build_ivf_index, upsert_ivf_index
    from serene_spark.operators.similarity import ivf_assign_sql

    full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = full.count()
    first = full.filter(f"vec_id < {n // 2}")
    second = full.filter(f"vec_id >= {n // 2}")

    index_path = str(tmp_path / "ivf_up")
    build_ivf_index(spark, sf_dir, index_path, vectors=first)
    upsert_ivf_index(spark, index_path, second)

    got = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(index_path).collect()
    )
    # expected: every vector assigned against the index's frozen centroids
    full.createOrReplaceTempView("__exp_vecs")
    spark.read.parquet(index_path + "_centroids").createOrReplaceTempView("__exp_cent")
    expected = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.sql(
            "WITH centroids AS (SELECT centroid_id, centroid FROM __exp_cent)\n"
            + ivf_assign_sql(SP, "__exp_vecs", "centroids")
        ).collect()
    )
    assert got == expected and len(got) == n

    # replaying the upsert is a no-op (anti-join idempotence)
    upsert_ivf_index(spark, index_path, second)
    assert spark.read.parquet(index_path).count() == n


def test_search_serves_upserted_vectors(spark, sf_dir, tmp_path):
    from serene_spark.operators.ivf_index import (
        build_ivf_index,
        search_ivf_index,
        upsert_ivf_index,
    )

    full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = full.count()
    index_path = str(tmp_path / "ivf_up2")
    build_ivf_index(spark, sf_dir, index_path, vectors=full.filter(f"vec_id < {n // 2}"))
    before = search_ivf_index(spark, sf_dir, index_path).collect()
    assert all(r["neighbor_id"] < n // 2 for r in before)

    upsert_ivf_index(spark, index_path, full.filter(f"vec_id >= {n // 2}"))
    after = search_ivf_index(spark, sf_dir, index_path).collect()
    # the upserted half is now reachable as neighbors
    assert any(r["neighbor_id"] >= n // 2 for r in after)
    # and results only ever improve or re-rank, never lose the corpus:
    # every query still returns a full top-k
    from collections import Counter

    per_query = Counter(r["query_id"] for r in after)
    assert per_query == Counter(r["query_id"] for r in before)


def test_ivf_scaled_geometry_derives_from_corpus_size(spark, sf_dir):
    """similarity_ivf_scaled's in-query geometry must equal the python
    formula k = clamp(2^floor(log2(sqrt(N))), 16, 1024) at every corpus
    size, and its result shape matches the fixed-geometry operator's."""
    import math

    from serene_spark.catalog import register_views
    from serene_spark.registry import load_all

    def expect_k(n):
        return max(16, min(1024, 2 ** int(math.floor(math.log2(math.sqrt(n))))))

    assert expect_k(500) == 16      # the parity corpus: same as fixed k
    assert expect_k(2000) == 32     # sf0.1
    assert expect_k(200_000) == 256  # sf10

    geom_sql = ("SELECT GREATEST(16, LEAST(1024, CAST(POW(2, FLOOR(LOG2("
                "SQRT(COUNT(*))))) AS INT))) AS k FROM embeddings")
    register_views(spark, sf_dir, ("embeddings",))
    n = spark.table("embeddings").count()
    k_sql = spark.sql(geom_sql).collect()[0]["k"]
    assert k_sql == expect_k(n)

    qs = load_all()
    rows = qs["similarity_ivf_scaled"].spark(spark, sf_dir).collect()
    assert rows
    # full top-k per query, rank sequence intact
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r["rk"])
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), q

    # at the parity corpus size the derived k equals the fixed geometry,
    # so the two operators must return the IDENTICAL result set
    if k_sql == 16:
        fixed = {(r["query_id"], r["neighbor_id"], r["rk"])
                 for r in qs["similarity_ivf"].spark(spark, sf_dir).collect()}
        scaled = {(r["query_id"], r["neighbor_id"], r["rk"]) for r in rows}
        assert scaled == fixed
