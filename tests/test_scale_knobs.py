"""Scale-parameterization knobs: LSH band geometry, ANN bucket width, and
the no-Expand profiling plan — executable documentation of the 100x story."""

from __future__ import annotations

from serene_spark.operators.dedup import lsh_band_geometry
from serene_spark.operators.similarity import ann_sign_bits


def test_lsh_band_geometry_tracks_threshold():
    # permissive threshold -> many narrow bands; strict -> few wide bands
    assert lsh_band_geometry(0.35) == (8, 2)
    assert lsh_band_geometry(0.9) == (2, 8)
    b, r = lsh_band_geometry(0.5)
    assert b * r == 16
    # monotone: stricter threshold never gets narrower bands
    rows = [lsh_band_geometry(t)[1] for t in (0.2, 0.4, 0.6, 0.9)]
    assert rows == sorted(rows)


def test_registered_band_geometry_flows_from_threshold():
    """BAND_SIZE is derived from the target threshold, not hardcoded — the
    registered LSH queries inherit whatever the helper picks."""
    from serene_spark.operators.dedup import (
        BAND_SIZE,
        LSH_BANDS,
        LSH_TARGET_JACCARD,
        N_LSH,
    )

    assert (LSH_BANDS, BAND_SIZE) == lsh_band_geometry(LSH_TARGET_JACCARD, N_LSH)
    assert LSH_BANDS * BAND_SIZE == N_LSH == 48
    # r=3 is the selectivity floor: background pairs collide per band at
    # J_bg^3, which keeps candidate volume ~linear on self-similar corpora
    assert BAND_SIZE >= 3


def test_ann_geom_rel_matches_python_twin():
    """The in-query bit-width relation must agree with ann_sign_bits at
    multiple corpus sizes (including past the cap)."""
    import duckdb

    from serene_spark.operators.similarity import (
        MAX_SIGN_BITS,
        ann_geom_rel,
        ann_sign_bits,
    )

    con = duckdb.connect()
    for n in (500, 5_000, 100_000, 10_000_000):
        con.sql(f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM range({n})")
        got = con.sql(
            f"WITH {ann_geom_rel('duckdb')} SELECT bits FROM ann_geom"
        ).fetchone()[0]
        assert got == ann_sign_bits(n, cap=MAX_SIGN_BITS), n


def test_ann_sign_bits_grows_with_corpus():
    assert ann_sign_bits(10_000) <= ann_sign_bits(1_000_000) <= ann_sign_bits(100_000_000)
    # ~256-vector buckets at any size
    assert ann_sign_bits(65_536, target_bucket_size=256) == 8
    assert 4 <= ann_sign_bits(10) <= 8          # floor
    assert ann_sign_bits(10**12) <= 30          # ceiling


def test_multiprobe_fills_topk(spark, sf_dir):
    """Multiprobe must recover at least as many (query, rank) slots as the
    single-bucket variant — and on this corpus the full TOP_K for every
    query it surfaces."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.similarity import TOP_K, ann_bucketed_sql

    register_views(spark, sf_dir, ("embeddings",))
    multi = spark.sql(ann_bucketed_sql(SPARK, multiprobe=True)).collect()
    single = spark.sql(ann_bucketed_sql(SPARK, multiprobe=False)).collect()
    assert len(multi) >= len(single)
    per_query = {}
    for r in multi:
        per_query.setdefault(r["query_id"], []).append(r["rk"])
    for q, rks in per_query.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= TOP_K


def test_profile_scalar_plan_has_no_expand(spark, sf_dir):
    """Distinct counts cascade through the value histogram — the 3x
    row-multiplying Expand rewrite must not appear in the plan."""
    from serene_spark.operators.profile_scalar import profile_scalar
    from serene_spark.plans.explain_audit import plan_text

    df = profile_scalar(spark, sf_dir, "customer")
    assert "Expand" not in plan_text(df)


def test_ivf_recall_and_refinement(spark, sf_dir):
    """IVF search must recover most of the brute-force top-5 (n_probe=4 of 16
    lists), and one Lloyd iteration must return k well-formed centroids."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.similarity import (
        N_CENTROIDS,
        cosine_topk_sql,
        ivf_refine_centroids,
        ivf_search_sql,
    )

    register_views(spark, sf_dir, ("embeddings",))
    exact = {(r["query_id"], r["neighbor_id"]) for r in spark.sql(cosine_topk_sql(SPARK)).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in spark.sql(ivf_search_sql(SPARK)).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"

    cents = ivf_refine_centroids(spark, sf_dir, iterations=1).collect()
    assert len(cents) <= N_CENTROIDS  # empty lists may drop a centroid
    assert all(len(r["centroid"]) == 64 for r in cents)


def test_lsh_verified_subset_of_exact(spark, sf_dir):
    """The verified-pipeline output must be a subset of the quadratic exact
    baseline at the same threshold (LSH bounds recall, never adds false
    positives after verification) and recover most of it on this corpus."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.dedup import lsh_verified_sql, ngram_jaccard_sql

    register_views(spark, sf_dir, ("documents",))
    exact = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in spark.sql(ngram_jaccard_sql(SPARK)).collect()
    }
    verified = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in spark.sql(lsh_verified_sql(SPARK)).collect()
    }
    assert set(verified) <= set(exact)
    for pair, j in verified.items():
        assert j == exact[pair]  # verification is EXACT Jaccard
    assert exact, "fixture should contain near-duplicate documents"
    assert len(verified) / len(exact) >= 0.7, "LSH recall too low on test corpus"


def test_dedup_clusters_match_networkx(spark, sf_dir):
    """Min-label propagation must produce exactly the connected components of
    the verified-pair graph (cluster id = component's min doc_id)."""
    import networkx as nx

    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.dedup import dedup_clusters, lsh_verified_sql

    register_views(spark, sf_dir, ("documents",))
    pairs = [(r["doc_id_1"], r["doc_id_2"]) for r in spark.sql(lsh_verified_sql(SPARK)).collect()]
    g = nx.Graph(pairs)
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for d in comp:
            want[d] = m

    got = {r["doc_id"]: r["cluster"] for r in dedup_clusters(spark, sf_dir).collect()}
    assert got == want
    assert any(v != k for k, v in got.items()), "fixture should have real clusters"


def test_semdedup_geom_scales_with_corpus():
    """The in-query k must follow the semdedup_k formula: floor at 16 on the
    test corpus, growing with n at scale."""
    import duckdb

    from serene_spark.functions.sqlgen import DUCKDB
    from serene_spark.operators.curation import semdedup_geom_rel, semdedup_k

    con = duckdb.connect()
    for n in (500, 4096 * 20, 4096 * 1000):
        con.execute("CREATE OR REPLACE VIEW embeddings AS "
                    f"SELECT * FROM range({n}) t(vec_id)")
        k = con.execute(
            f"WITH {semdedup_geom_rel(DUCKDB)} SELECT k FROM sem_geom"
        ).fetchone()[0]
        assert k == semdedup_k(n), (n, k)
