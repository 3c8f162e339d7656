"""Physical-plan audits: the properties that must survive a 1000x scale-up.

These are executable documentation of the scale design — if a refactor makes
a filter stop reaching the scan or turns a keyed join cartesian, these fail
before any benchmark does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from serene_spark.catalog import load_table
from serene_spark.plans.explain_audit import (
    broadcast_join_count,
    has_cartesian,
    has_codegen,
    plan_text,
    pushed_filters,
    read_schema_columns,
)
from serene_spark.operators.clustering import N_ITER as N_ITER_KMEANS


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") == 42)
    assert pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    assert read_schema_columns(df) == 2


def test_profile_prunes_scan_to_melted_columns(spark, sf_dir):
    from serene_spark.functions.melt import melt

    df = melt(load_table(spark, sf_dir, "customer"), ["c_name", "c_mktsegment"])
    assert read_schema_columns(df) == 2


def test_q3_no_cartesian_and_codegen(spark, sf_dir):
    from serene_spark.registry import load_all

    q = load_all()["q3_shipping_priority"]
    df = q.spark(spark, sf_dir)
    assert not has_cartesian(df)
    assert has_codegen(df)


def test_q5_broadcasts_dimensions(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["q5_local_supplier"].spark(spark, sf_dir)
    # nation/region/supplier sides are tiny -> at least two broadcast joins
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian(df)


def test_ann_bucketed_is_equijoin(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["similarity_ann_bucketed"].spark(spark, sf_dir)
    assert not has_cartesian(df)


def test_asof_join_is_union_plus_window(spark, sf_dir):
    """The as-of join must never materialize (event, order) pairs: its plan is
    a union + one window — NO join operator of any kind (the old
    inequality-join + argmax shape had per-key quadratic blowup)."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    df = load_all()["asof_join_events_orders"].spark(spark, sf_dir)
    txt = plan_text(df)
    assert "Window" in txt
    assert "Union" in txt
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join_op not in txt, f"unexpected {join_op} in as-of plan"


def test_ivf_centroids_broadcast_and_probe_equijoin(spark, sf_dir):
    """IVF plan contract: centroid assignment broadcasts the 16-row centroid
    side (intentional bounded nested loop, never a corpus x corpus product);
    the inverted-list candidate join is a broadcast equi-join on centroid_id."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.similarity import ivf_search_sql
    from serene_spark.plans.explain_audit import plan_text

    register_views(spark, sf_dir, ("embeddings",))
    txt = plan_text(spark.sql(ivf_search_sql(SPARK)))
    assert "BroadcastNestedLoopJoin" in txt  # corpus x 16 centroids only
    assert "CartesianProduct" not in txt
    assert "BroadcastHashJoin" in txt        # probe-side candidates equi-join


def test_lsh_verified_all_equijoins(spark, sf_dir):
    """The verified dedup pipeline must stay equi-join end-to-end: bands,
    candidate intersection, and count joins — no nested loop anywhere."""
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.dedup import lsh_verified_sql
    from serene_spark.plans.explain_audit import has_cartesian

    register_views(spark, sf_dir, ("documents",))
    assert not has_cartesian(spark.sql(lsh_verified_sql(SPARK)))


def test_lsh_tail_reads_materialized_signatures(spark, sf_dir):
    """The banded-LSH tail references the signature relation ~10 times; the
    runner must feed it a materialized (localCheckpoint) relation so the
    shingle->minhash pipeline runs once — no parquet scan in the tail plan."""
    from serene_spark.operators.dedup import dedup_minhash_lsh_spark
    from serene_spark.plans.explain_audit import plan_text

    txt = plan_text(dedup_minhash_lsh_spark(spark, sf_dir))
    assert "FileScan" not in txt
    assert "Scan ExistingRDD" in txt or "LogicalRDD" in txt  # checkpointed source


def test_range_join_is_equijoin(spark, sf_dir):
    """The interval predicate must reach the executor as a day-bucket
    EQUI-join with a post-filter — never a nested-loop over per-user pairs."""
    from serene_spark.operators.events import range_join_orders_events
    from serene_spark.plans.explain_audit import has_cartesian

    assert not has_cartesian(range_join_orders_events(spark, sf_dir))


def test_new_tpch_queries_no_cartesian(spark, sf_dir):
    """Q7/Q8/Q13/Q15/Q17/Q19/Q21/Q22: multi-way joins, correlated EXISTS
    rewrites, and anti-joins must all plan as hash/sort-merge joins — never a
    cartesian or nested-loop fallback."""
    from serene_spark.registry import load_all

    qs = load_all()
    for name in (
        "q7_volume_shipping",
        "q8_market_share",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q17_small_quantity",
        "q19_discounted_revenue",
        "q21_waiting_suppliers",
        "q22_global_sales",
    ):
        df = qs[name].spark(spark, sf_dir)
        assert not has_cartesian(df), name


def test_q8_broadcasts_dimensions(spark, sf_dir):
    """The 8-way join's part/nation/region/supplier sides are dimension-sized
    -> several broadcast joins, with the lineitem fact never broadcast."""
    from serene_spark.registry import load_all

    df = load_all()["q8_market_share"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 3


def test_q19_pushes_disjunctive_part_filter(spark, sf_dir):
    """The brand/size disjunction is part-side-only, so Catalyst must push a
    derived Or filter into the part scan (partial pushdown of the OR)."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    txt = plan_text(load_all()["q19_discounted_revenue"].spark(spark, sf_dir))
    pushed = [
        line for line in txt.splitlines()
        if "PushedFilters:" in line and "PushedFilters: []" not in line
    ]
    assert any("p_brand" in line and "Or(" in line for line in pushed), pushed


def test_curation_queries_no_cartesian(spark, sf_dir):
    """The curation family's joins must all be keyed: decontaminate's gram
    overlap, snapshot-delta's anti-join, and semdedup's within-cluster pair
    join are equi-joins; only semdedup's centroid ASSIGNMENT is a deliberate
    broadcast nested-loop over k tiny centroids (the IVF design)."""
    from serene_spark.registry import load_all

    qs = load_all()
    for name in ("decontaminate", "snapshot_delta_dedup", "stratified_sample",
                 "shard_assign", "pii_scan_customer"):
        assert not has_cartesian(qs[name].spark(spark, sf_dir)), name


def test_snapshot_delta_plans_left_anti(spark, sf_dir):
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    df = load_all()["snapshot_delta_dedup"].spark(spark, sf_dir)
    assert "LeftAnti" in plan_text(df)  # NOT EXISTS planned as anti hash join


def test_semdedup_pairs_are_equijoin_on_cluster(spark, sf_dir):
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    txt = plan_text(load_all()["semdedup"].spark(spark, sf_dir))
    # the within-cluster pair join is keyed on centroid_id; the only
    # nested-loop joins are the k-centroid assignment/probe scans
    assert "centroid_id" in txt


def test_stratified_sample_is_map_only(spark, sf_dir):
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    txt = plan_text(load_all()["stratified_sample"].spark(spark, sf_dir))
    assert "Exchange" not in txt.replace("ReusedExchange", "")  # no shuffle


def test_fused_profile_reads_histogram_not_raw(spark, sf_dir):
    """The ML feature matrix must consume the materialized histogram (an
    ExistingRDD/checkpoint scan), not re-aggregate the raw long relation in
    each family subplan."""
    from serene_spark.functions.melt import melt
    from serene_spark.ml.pipeline import profile_features_from_long
    from serene_spark.plans.explain_audit import plan_text

    df = profile_features_from_long(
        spark, melt(load_table(spark, sf_dir, "customer"))
    )
    txt = plan_text(df)
    assert "Scan ExistingRDD" in txt  # checkpointed histogram feeds the tail


def test_substring_dedup_no_cartesian_and_codegen(spark, sf_dir):
    """The k-gram chain pairs via fp equi-joins with a df cap — never a
    cross product of documents."""
    from serene_spark.registry import load_all

    df = load_all()["substring_dedup_pairs"].spark(spark, sf_dir)
    assert not has_cartesian(df)
    assert has_codegen(df)


def test_packing_windows_are_shard_partitioned(spark, sf_dir):
    """The packing cumsum must run as shard-partitioned windows — a global
    (SinglePartition) window would serialize the whole corpus through one
    task at 100 TB."""
    from serene_spark.registry import load_all

    import re

    df = load_all()["sequence_pack_manifest"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert win_lines, plan
    for l in win_lines:
        # windowspecdefinition(<partcol>, doc_id ASC, ...) — a non-empty
        # partition list, i.e. NOT a global window
        m = re.search(r"windowspecdefinition\(([^,]+),", l)
        assert m and "doc_id" not in m.group(1), l
        part_col = m.group(1).split("#")[0].strip()
        # the exchange feeding this window hashes on that partition column
        assert f"hashpartitioning({part_col}" in plan, (part_col, plan)
    # the only SinglePartition exchanges belong to one-row scalar aggregates
    # (shard_cfg count), never directly under a Window
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Window [" in l:
            below = "\n".join(lines[i : i + 3])
            assert "SinglePartition" not in below, below


def test_source_minhash_single_signature_shuffle(spark, sf_dir):
    """The MinHash sibling reduces grams to per-source signatures with ONE
    wide MIN aggregation — map-side combine means the shuffle carries
    source-keyed partials, and the pair join is over the tiny sig relation."""
    from serene_spark.registry import load_all

    df = load_all()["source_similarity_minhash"].spark(spark, sf_dir)
    # (the a.source < b.source pair join may plan as a nested loop over the
    # #sources-sized sig relation — bounded by a constant, that's fine)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan[:2000]


def test_retrieval_queries_no_cartesian(spark, sf_dir):
    """BM25 / TF-IDF / novelty: every join is keyed (term, doc, gram) —
    no cross product anywhere in the retrieval family."""
    from serene_spark.registry import load_all

    qs = load_all()
    for name in ("bm25_search", "tfidf_top_terms", "ngram_novelty"):
        df = qs[name].spark(spark, sf_dir)
        assert not has_cartesian(df), name
        assert has_codegen(df), name


def test_bm25_rank_window_only_over_matched(spark, sf_dir):
    """The top-k rank must consume the pruned posting relation — a global
    window over the corpus would serialize all documents through one task.
    The plan's sort/window input must sit behind the query-term filter."""
    from serene_spark.registry import load_all

    df = load_all()["bm25_search"].spark(spark, sf_dir)
    plan = plan_text(df)
    # the query-term IN-list prune exists in the plan (postings pruned
    # before df/idf/rank, not after)
    assert "tok IN " in plan or "tok#" in plan and "IN (" in plan, plan


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    """The assignment join (points x centroids) must broadcast the K*D
    centroid side — shuffling N*D point rows per iteration to co-locate
    with a metadata-sized relation is the wrong plan at any scale."""
    from serene_spark.registry import load_all

    df = load_all()["kmeans_embeddings"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= N_ITER_KMEANS  # one per iteration
    assert not has_cartesian(df)


def test_triangle_orientation_joins_are_keyed(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["triangle_counts"].spark(spark, sf_dir)
    assert not has_cartesian(df)
    assert has_codegen(df)


def test_bottomk_containment_joins_are_keyed(spark, sf_dir):
    """The probe join must key on the shingle (the inverted-index lookup) —
    never a cross product of documents."""
    from serene_spark.registry import load_all

    df = load_all()["dedup_containment_bottomk"].spark(spark, sf_dir)
    assert not has_cartesian(df)
    assert has_codegen(df)


def test_trending_rank_window_is_hour_keyed(spark, sf_dir):
    """The trending rank must partition by window_start — a global rank
    would serialize all hours through one task."""
    from serene_spark.registry import load_all

    df = load_all()["events_trending_hourly"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    assert any("window_start" in s for s in specs), plan


def test_skew_and_cbo_audits_no_cartesian(spark, sf_dir):
    from serene_spark.registry import load_all

    for name in ("join_key_skew", "cbo_estimate_audit", "zorder_skip_estimate",
                 "events_attribution_linear", "event_path_3grams",
                 "curriculum_plan"):
        df = load_all()[name].spark(spark, sf_dir)
        # zorder_skip probes ARE a deliberate manifest-scale cross join;
        # everything else must be free of cross products
        if name != "zorder_skip_estimate":
            assert not has_cartesian(df), name


def test_new_session_ops_no_cartesian(spark, sf_dir):
    """The round-4 additions that must stay keyed/broadcast at scale.
    chisq's margin-cross grid and benford's digit spine are deliberate
    tiny-relation crosses (margin x margin / 9-row), so they are exempt;
    everything else must plan without a cross product."""
    from serene_spark.registry import load_all

    for name in (
        "km_order_gap",
        "km_order_gap_by_segment",
        "mannwhitney_value",
        "cusum_daily_revenue",
        "robust_outliers_daily",
        "asof_fwd_click_purchase",
        "source_quality_profile",
        "embedding_sq8_audit",
        "boxplot_orders_by_segment",
        "readability_scores",
        "k_anonymity_audit",
    ):
        df = load_all()[name].spark(spark, sf_dir)
        assert not has_cartesian(df), name


def test_km_segment_windows_are_segment_keyed(spark, sf_dir):
    """The stratified KM curve must partition every cumulative window by
    segment — a global window would serialize all strata through one
    task (the overall curve's single-partition window is the documented
    duration-histogram exception)."""
    import re

    from serene_spark.registry import load_all

    df = load_all()["km_order_gap_by_segment"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    # every risk/product window carries the seg partition key
    assert all("seg" in s or "o_custkey" in s for s in specs), plan


def test_boxplot_broadcasts_customer_dim(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["boxplot_orders_by_segment"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian(df)


def test_readability_is_map_only(spark, sf_dir):
    """Three regex counts per row, no joins: the plan must contain no
    join at all and keep whole-stage codegen."""
    from serene_spark.registry import load_all

    df = load_all()["readability_scores"].spark(spark, sf_dir)
    plan = plan_text(df)
    assert "Join" not in plan, plan
    assert has_codegen(df)


def test_canonical_select_windows_are_cluster_keyed(spark, sf_dir):
    """Keeper selection must partition by cluster id (components are
    tiny); a global window would funnel the corpus through one task."""
    import re

    from serene_spark.registry import load_all

    df = load_all()["dedup_canonical_select"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    assert all("cluster" in s for s in specs), plan


def test_session_recsys_info_ops_no_cartesian(spark, sf_dir):
    """This session's additions that must stay keyed at scale.  Exempt by
    design: matryoshka_recall crosses the 4-row tier spine with the query
    melt (tiny x bounded), kcenter_select compares every point against ONE
    selected point per round (a 64-row broadcast side Catalyst may plan as
    BNLJ), and bootstrap_ci_revenue folds its two single-row stat relations
    with a 1x1 join — constant-sized sides, not data x data."""
    from serene_spark.plans.explain_audit import has_cartesian
    from serene_spark.registry import load_all

    for name in (
        "abc_pareto_parts",
        "item_item_cosine",
        "wilson_return_rank",
        "markov_stationary",
        "mutual_info_orders",
        "hybrid_rrf_search",
    ):
        df = load_all()[name].spark(spark, sf_dir)
        assert not has_cartesian(df), name


def test_abc_pareto_prunes_lineitem_columns(spark, sf_dir):
    """The ABC scan must read exactly the 3 columns it uses (partkey,
    extendedprice, discount) — a full-width read of the fact table is the
    100 TB failure mode."""
    from serene_spark.plans.explain_audit import read_schema_columns
    from serene_spark.registry import load_all

    df = load_all()["abc_pareto_parts"].spark(spark, sf_dir)
    assert read_schema_columns(df) == 3


def test_item_item_pairs_are_basket_keyed(spark, sf_dir):
    """The CF pair generation must join ON the order key (in-basket,
    cost sum(basket^2)) — the plan must carry an equi-join on l_orderkey,
    never a part x part product."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    txt = plan_text(load_all()["item_item_cosine"].spark(spark, sf_dir))
    assert "l_orderkey" in txt
    assert "CartesianProduct" not in txt


def test_bootstrap_is_one_scan(spark, sf_dir):
    """All 100 Poisson replicates must come from ONE orders scan (the
    explode multiplies rows map-side); a per-replicate rescan would read
    the fact table B times."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    txt = plan_text(load_all()["bootstrap_ci_revenue"].spark(spark, sf_dir))
    # one scan for the replicate explode + one for the point estimate
    # (each scan prints twice in formatted plans: tree line + detail block)
    scans = sum(1 for l in txt.splitlines() if l.startswith("(") and "Scan parquet" in l)
    assert scans <= 2, txt


def test_cte_heavy_ops_consume_materialized_base(spark, sf_dir):
    """The iterative/multi-reference CTE queries must run their tails
    against the ONE materialized base relation: Catalyst inlines a CTE at
    every reference site, and before materialization these plans re-derived
    the parquet scan up to 200+ times (kcenter) / 36 times (mutual_info).
    Zero parquet scans in the returned plan = the base was scanned exactly
    once, in the localCheckpoint pass."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    for name in (
        "mutual_info_orders",
        "kcenter_select",
        "item_item_cosine",
        "markov_stationary",
        "hybrid_rrf_search",
        "matryoshka_recall",
        # the repo-wide sweep's top offenders, re-based the same way
        # (pre-fix scan counts: 148/102/91/70/48/45/38/27/18/15/14/13/12/10/8)
        "triangle_counts",
        "trend_mann_kendall",
        "kmeans_cluster_quality",
        "cusum_daily_revenue",
        "ts_acf_daily",
        "kmeans_embeddings",
        "kruskal_wallis_value",
        "benford_audit_prices",
        "rfm_segments",
        "robust_outliers_daily",
        "customer_spend_concentration",
        "bloom_filter_stats",
        "chisq_type_dow",
        "events_retention_days",
    ):
        txt = plan_text(load_all()[name].spark(spark, sf_dir))
        scans = sum(
            1 for l in txt.splitlines() if l.startswith("(") and "Scan parquet" in l
        )
        assert scans == 0, (name, scans)
    # source_quality's tail reads the documents METADATA columns directly
    # (source/n_chars — not derivable from the materialized token views);
    # down from 12 scans to the 2 legitimate metadata reads
    txt = plan_text(load_all()["source_quality_profile"].spark(spark, sf_dir))
    scans = sum(1 for l in txt.splitlines() if l.startswith("(") and "Scan parquet" in l)
    assert scans <= 2, scans


def test_round5_operators_no_cartesian(spark, sf_dir):
    """Round-5 additions: no plan may contain a CartesianProduct.  The
    strict has_cartesian() helper also rejects BroadcastNestedLoopJoin,
    which several of these ops use DELIBERATELY to attach a 1-row stats
    relation (the broadcast side is constant-size by construction), so
    this audit checks the cartesian operator itself."""
    from serene_spark.plans.explain_audit import plan_text
    from serene_spark.registry import load_all

    qs = load_all()
    for name in (
        "mahalanobis_outliers",
        "attribution_position_u",
        "wasserstein_value_dist",
        "spearman_qty_price",
        "multiple_testing_bh",
        "elasticity_loglog_parts",
        "lorenz_customers",
        "geo_nearest_supplier",
    ):
        df = qs[name].spark(spark, sf_dir)
        assert "CartesianProduct" not in plan_text(df), name


def test_elasticity_broadcasts_part_dim(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["elasticity_loglog_parts"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 1


def test_round8_operators_no_cartesian_and_keyed_windows(spark, sf_dir):
    """Round-8 additions keep the plan contract: no cartesian products,
    the KMV bottom-K windows are event_type-keyed (never a global sort),
    and the corpus-build composition reads the materialized selection."""
    from serene_spark.registry import load_all

    qs = load_all()
    # Exempt from the cartesian check, both DELIBERATE constant-sized
    # shapes: kmv_set_ops_users' type-pair join (a.type < b.type) runs
    # over the |event types| = 5-row relation with K-bounded sketches;
    # corpus_build_manifest inherits sequence_pack_manifest's CROSS JOIN
    # against the ONE-ROW shard_cfg aggregate (the in-query scale knob —
    # a scalar broadcast, not a data-scale product).
    for name in ("dp_release_counts", "gate_agreement_kappa",
                 "kmv_ndv_users", "ppmi_spectral_embedding"):
        df = qs[name].spark(spark, sf_dir)
        assert not has_cartesian(df), name

    # KMV sketch window partitions by event_type, and Catalyst turned the
    # rk <= K filter into a WindowGroupLimit — the bottom-K never fully
    # ranks a partition (the property that keeps the sketch cheap at scale)
    plan = plan_text(qs["kmv_ndv_users"].spark(spark, sf_dir))
    assert "windowspecdefinition(event_type" in plan
    assert "WindowGroupLimit" in plan

    # the corpus-build tail consumes ONLY materialized views (selection
    # and tokenized selected docs): zero parquet scans in the final
    # statement — selection + tokenization ran exactly once upstream
    final = plan_text(qs["corpus_build_manifest"].spark(spark, sf_dir))
    assert final.count("Scan parquet") == 0

    # the spectral-embedding tail likewise consumes ONLY materialized
    # views (PPMI matrix + vocab): zero parquet scans in the iteration
    # statement — the document token scan ran exactly once upstream
    final = plan_text(qs["ppmi_spectral_embedding"].spark(spark, sf_dir))
    assert final.count("Scan parquet") == 0
