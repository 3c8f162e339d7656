"""Metamorphic property laws for the SQL operator surface.

The parity gate's one structural blind spot: Spark query and DuckDB
oracle are generated from the SAME dialect-shimmed SQL
(functions/sqlgen.py), so a shared semantic bug passes 362/362 parity by
construction. These laws are derived from the operators' CLAIMED
semantics, not from the shared SQL, so they fail when both engines agree
on the wrong answer:

* **permutation invariance** — re-ordering and re-partitioning input
  rows must not change any result (relational semantics);
* **file-split invariance** — the same rows split across many parquet
  files must not change any result (a 1000-executor cluster never sees
  one file);
* **duplication scaling** — doubling every input row transforms each
  output column in a KNOWN way (counts x2, distinct-counts / means /
  mins / maxes / nearest-rank medians / L2-normalized frequencies
  unchanged, proportions-of-total halved), pinned column by column;
* **content-twin laws** — appending an exact-content duplicate document
  under a fresh id must surface it (dedup pair with similarity 1.0,
  mirrored per-doc feature rows, doubled n_docs with an unchanged
  keeper);
* **equivariance / self-consistency raw checks** — time-shifting events
  by exactly one hour shifts tumbling windows and leaves sessionization
  unchanged; connected-component labels are the component minimum; BM25
  ranks are the dense descending order of the scores; downsampling hits
  the documented per-class target exactly.

Coverage: 20 operators x >= 3 laws, spanning profiling, sketches, dedup,
text analysis, retrieval, resampling, packing, and graph families.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from serene_spark.catalog import TABLES, load_table
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"
TWIN_OFFSET = 10_000_000
TWIN_OFFSET_17 = 10_000_012  # = 17 * 588_236: preserves doc_id % 17


# ---------------------------------------------------------------- harness

@pytest.fixture(scope="module")
def queries():
    return load_all()


@pytest.fixture(scope="module")
def variant(spark, tmp_path_factory):
    """variant(table, kind) -> sf_dir with ONE table transformed and the
    rest symlinked; built lazily and cached for the module."""
    root = tmp_path_factory.mktemp("metamorphic")
    cache: dict[tuple[str, str], str] = {}

    def get(table: str, kind: str) -> str:
        if (table, kind) in cache:
            return cache[(table, kind)]
        d = root / f"{table}_{kind}"
        d.mkdir()
        for t in TABLES:
            if t != table:
                os.symlink(f"{SF}/{t}.parquet", str(d / f"{t}.parquet"))
        df = load_table(spark, SF, table)
        if kind == "permute":
            out = (df.withColumn("__r", F.rand(11)).repartition(3, "__r")
                   .sortWithinPartitions("__r").drop("__r"))
        elif kind == "split":
            out = df.repartition(6)
        elif kind == "dup":
            out = df.unionAll(df)
        elif kind == "twin":  # documents: one content twin under a new id
            first = df.orderBy("doc_id").limit(1)
            out = df.unionAll(
                first.withColumn("doc_id", F.col("doc_id") + TWIN_OFFSET))
        elif kind == "twin_all":  # documents: a content twin for EVERY doc
            out = df.unionAll(
                df.withColumn("doc_id", F.col("doc_id") + TWIN_OFFSET))
        elif kind == "twin_all_17":  # twin offset divisible by 17, so a
            # doc_id % 17 split (decontaminate's bench/train) is preserved
            out = df.unionAll(
                df.withColumn("doc_id", F.col("doc_id") + TWIN_OFFSET_17))
        elif kind == "shift1h":  # events: exact one-hour shift
            out = df.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        else:  # pragma: no cover
            raise ValueError(kind)
        out.write.mode("overwrite").parquet(str(d / f"{table}.parquet"))
        cache[(table, kind)] = str(d)
        return str(d)

    return get


def _norm(df) -> pd.DataFrame:
    pdf = df.toPandas()
    keys = [c for c in pdf.columns if pdf[c].dtype.kind not in "fc"]
    pdf = pdf.sort_values(keys or list(pdf.columns)).reset_index(drop=True)
    return pdf


def _assert_same(a: pd.DataFrame, b: pd.DataFrame) -> None:
    # atol absorbs the last-digit wobble of round(x, 6) outputs under a
    # different partition-order summation; anything larger is a real bug
    pd.testing.assert_frame_equal(a, b, check_exact=False,
                                  rtol=3e-6, atol=3e-6)


def _run(queries, name, spark, sf):
    return _norm(queries[name].spark(spark, sf))


def _assert_invariant(queries, name, spark, variant, table,
                      kinds=("permute", "split")) -> pd.DataFrame:
    base = _run(queries, name, spark, SF)
    for kind in kinds:
        got = _run(queries, name, spark, variant(table, kind))
        _assert_same(base, got)
    return base


def _assert_dup_law(queries, name, spark, variant, table, base,
                    x2: tuple[str, ...], half: tuple[str, ...] = (),
                    exclude: tuple[str, ...] = ()) -> None:
    """Doubling every row of ``table``: columns in ``x2`` double, in
    ``half`` halve, everything else (minus ``exclude``) is unchanged."""
    dup = _run(queries, name, spark, variant(table, "dup"))
    assert len(dup) == len(base)
    for c in base.columns:
        if c in exclude:
            continue
        if base[c].dtype.kind in "if":
            factor = 2.0 if c in x2 else (0.5 if c in half else 1.0)
            np.testing.assert_allclose(
                dup[c].astype(float), factor * base[c].astype(float),
                rtol=3e-6, atol=3e-6, err_msg=f"{name}.{c}")
        else:
            assert (dup[c].values == base[c].values).all(), f"{name}.{c}"


# ------------------------------------------------- relational / profiling

def test_q1_pricing_summary_laws(spark, queries, variant):
    base = _assert_invariant(queries, "q1_pricing_summary", spark, variant,
                             "lineitem")
    _assert_dup_law(queries, "q1_pricing_summary", spark, variant,
                    "lineitem", base,
                    x2=("sum_qty", "sum_base_price", "sum_disc_price",
                        "sum_charge", "count_order"))


def test_profile_scalar_laws(spark, queries, variant):
    base = _assert_invariant(queries, "profile_scalar_customer", spark,
                             variant, "customer")
    # n_values doubles; prop_unique halves (same uniques over 2x rows);
    # every distinct-value-weighted feature (ratios, means-per-entry,
    # entropy over the count DISTRIBUTION, date/range props) is invariant
    _assert_dup_law(queries, "profile_scalar_customer", spark, variant,
                    "customer", base,
                    x2=("n_values",), half=("prop_unique_vals",))


def test_typeinfer_laws(spark, queries, variant):
    base = _assert_invariant(queries, "typeinfer_customer", spark, variant,
                             "customer")
    _assert_dup_law(queries, "typeinfer_customer", spark, variant,
                    "customer", base, x2=("type_votes",))


def test_textlen_stats_laws(spark, queries, variant):
    base = _assert_invariant(queries, "textlen_stats_customer", spark,
                             variant, "customer")
    # nearest-rank median at ceil(n/2) is duplication-invariant:
    # doubled_sorted[ceil(2n/2)] = doubled_sorted[n] = sorted[ceil(n/2)]
    _assert_dup_law(queries, "textlen_stats_customer", spark, variant,
                    "customer", base, x2=("n_values",))


def test_numeric_stats_laws(spark, queries, variant):
    base = _assert_invariant(queries, "numeric_stats_customer", spark,
                             variant, "customer")
    _assert_dup_law(queries, "numeric_stats_customer", spark, variant,
                    "customer", base, x2=("n_numeric",))


def test_chardist_laws(spark, queries, variant):
    base = _assert_invariant(queries, "chardist_customer", spark, variant,
                             "customer")
    # raw char counts double; the L2-normalized distribution is invariant
    _assert_dup_law(queries, "chardist_customer", spark, variant,
                    "customer", base, x2=("cnt",))


def test_term_freq_laws(spark, queries, variant):
    base = _assert_invariant(queries, "term_freq_customer", spark, variant,
                             "customer")
    _assert_dup_law(queries, "term_freq_customer", spark, variant,
                    "customer", base, x2=("cnt",))


# --------------------------------------------------------------- sketches

def test_kmv_laws(spark, queries, variant):
    base = _assert_invariant(queries, "kmv_ndv_users", spark, variant,
                             "events")
    # the sketch hashes DISTINCT user-days: full readout dup-invariant
    _assert_dup_law(queries, "kmv_ndv_users", spark, variant,
                    "events", base, x2=())


def test_quantile_sketch_laws(spark, queries, variant):
    base = _assert_invariant(queries, "quantile_sketch_bottomk", spark,
                             variant, "events")
    # exact nearest-rank quantiles are dup-invariant, n doubles; the
    # bottom-k SAMPLE side hashes row identity, so estimates legitimately
    # move under duplication — excluded, not silently absorbed
    _assert_dup_law(queries, "quantile_sketch_bottomk", spark, variant,
                    "events", base, x2=("n",),
                    exclude=("sample_n", "p50_est", "p50_rel_err",
                             "p90_est", "p90_rel_err",
                             "p99_est", "p99_rel_err"))


# ----------------------------------------------------------------- events

def test_sessionize_laws(spark, queries, variant):
    base = _assert_invariant(queries, "events_sessionize", spark, variant,
                             "events")
    # gap-based sessionization is shift-equivariant: +1h changes nothing
    shifted = _run(queries, "events_sessionize", spark,
                   variant("events", "shift1h"))
    _assert_same(base, shifted)


def test_tumbling_hour_laws(spark, queries, variant):
    base = _assert_invariant(queries, "events_tumbling_hour", spark,
                             variant, "events")
    # exact one-hour shift: every window moves one hour, counts identical
    shifted = _run(queries, "events_tumbling_hour", spark,
                   variant("events", "shift1h"))
    base = base.assign(window_start=pd.to_datetime(base.window_start))
    shifted = shifted.assign(window_start=(
        pd.to_datetime(shifted.window_start) - pd.Timedelta(hours=1)))
    keys = ["window_start", "event_type"]
    _assert_same(base.sort_values(keys).reset_index(drop=True),
                 shifted.sort_values(keys).reset_index(drop=True))


# ------------------------------------------------------------------ dedup

def test_dedup_exact_laws(spark, queries, variant):
    base = _assert_invariant(queries, "dedup_exact", spark, variant,
                             "documents")
    # a content twin for every doc: same hash set, same keeper (twin ids
    # are higher), n_docs doubles
    twin = _run(queries, "dedup_exact", spark,
                variant("documents", "twin_all"))
    _assert_same(
        base.assign(n_docs=base.n_docs * 2), twin)


def test_dedup_minhash_lsh_laws(spark, queries, variant):
    base = _assert_invariant(queries, "dedup_minhash_lsh", spark, variant,
                             "documents")
    # one exact-content twin MUST surface as a candidate pair with
    # estimated Jaccard 1.0 (identical shingles -> identical signature ->
    # same band buckets)
    twin = _run(queries, "dedup_minhash_lsh", spark,
                variant("documents", "twin"))
    first_id = int(base_doc_min(spark))
    hit = twin[(twin.doc_id_1 == first_id)
               & (twin.doc_id_2 == first_id + TWIN_OFFSET)]
    assert len(hit) == 1 and float(hit.iloc[0].est_jaccard) == 1.0


def test_dedup_ngram_jaccard_laws(spark, queries, variant):
    base = _assert_invariant(queries, "dedup_ngram_jaccard", spark,
                             variant, "documents")
    assert ((base.jaccard >= 0) & (base.jaccard <= 1)).all()
    twin = _run(queries, "dedup_ngram_jaccard", spark,
                variant("documents", "twin"))
    first_id = int(base_doc_min(spark))
    hit = twin[(twin.doc_id_1 == first_id)
               & (twin.doc_id_2 == first_id + TWIN_OFFSET)]
    assert len(hit) == 1 and float(hit.iloc[0].jaccard) == 1.0


def base_doc_min(spark) -> int:
    return load_table(spark, SF, "documents").agg(
        F.min("doc_id")).collect()[0][0]


# ------------------------------------------------------------------- text

def test_text_quality_laws(spark, queries, variant):
    base = _assert_invariant(queries, "text_quality", spark, variant,
                             "documents")
    # per-doc map: content twins mirror their originals exactly
    twin = _run(queries, "text_quality", spark,
                variant("documents", "twin_all"))
    orig = twin[twin.doc_id < TWIN_OFFSET].reset_index(drop=True)
    mirror = twin[twin.doc_id >= TWIN_OFFSET].reset_index(drop=True)
    _assert_same(base, orig)
    _assert_same(base, mirror.assign(doc_id=mirror.doc_id - TWIN_OFFSET))


def test_lang_id_laws(spark, queries, variant):
    base = _assert_invariant(queries, "lang_id", spark, variant,
                             "documents")
    twin = _run(queries, "lang_id", spark, variant("documents", "twin_all"))
    mirror = twin[twin.doc_id >= TWIN_OFFSET].reset_index(drop=True)
    _assert_same(base, mirror.assign(doc_id=mirror.doc_id - TWIN_OFFSET))


# ------------------------------------------------- graph / packing / rank

def test_cc_large_star_laws(spark, queries, variant):
    base = _assert_invariant(queries, "cc_large_star", spark, variant,
                             "documents")
    # large-star/small-star converges to min-id labeling: every cluster
    # label IS a member of its own cluster and is that cluster's minimum
    by_cluster = base.groupby("cluster")["doc_id"].agg(["min"])
    assert (by_cluster.index.values == by_cluster["min"].values).all()


def test_epoch_shuffle_plan_laws(spark, queries, variant):
    base = _assert_invariant(queries, "epoch_shuffle_plan", spark, variant,
                             "documents")
    # hash-to-block is a partition of the corpus: per-epoch doc totals
    # equal the corpus size, for every variant
    n_docs = load_table(spark, SF, "documents").count()
    per_epoch = base.groupby("epoch")["n_docs"].sum()
    assert (per_epoch == n_docs).all()


def test_bm25_search_laws(spark, queries, variant):
    base = _assert_invariant(queries, "bm25_search", spark, variant,
                             "documents")
    # rank is the contiguous dense descending order of the scores
    assert sorted(base["rank"]) == list(range(1, len(base) + 1))
    by_rank = base.sort_values("rank")
    assert (by_rank.bm25.diff().dropna() <= 3e-9).all()
    assert (base.n_terms_matched >= 1).all()


def test_similarity_cosine_topk_laws(spark, queries, variant):
    base = _assert_invariant(queries, "similarity_cosine_topk", spark,
                             variant, "embeddings")
    # rank self-consistency: per query, rk contiguous from 1 and cosine
    # non-increasing along it; cosine of unit vectors bounded
    for _, g in base.groupby("query_id"):
        g = g.sort_values("rk")
        assert list(g.rk) == list(range(1, len(g) + 1))
        assert (g.cosine.diff().dropna() <= 3e-9).all()
    assert ((base.cosine >= -1 - 1e-9) & (base.cosine <= 1 + 1e-9)).all()


def test_dedup_simhash_laws(spark, queries, variant):
    base = _assert_invariant(queries, "dedup_simhash_pairs", spark,
                             variant, "documents")
    assert (base.hamming >= 0).all()
    # identical text -> identical simhash -> the twin pair MUST surface
    # at hamming 0 (pigeonhole bands of equal signatures always collide)
    twin = _run(queries, "dedup_simhash_pairs", spark,
                variant("documents", "twin"))
    first_id = int(base_doc_min(spark))
    hit = twin[(twin.doc_id_1 == first_id)
               & (twin.doc_id_2 == first_id + TWIN_OFFSET)]
    assert len(hit) == 1 and int(hit.iloc[0].hamming) == 0


def test_stratified_sample_laws(spark, queries, variant):
    base = _assert_invariant(queries, "stratified_sample", spark, variant,
                             "documents")
    # the md5-threshold draw is per-doc deterministic: adding twin docs
    # must not change ANY original doc's selection (subset stability)
    twin = _run(queries, "stratified_sample", spark,
                variant("documents", "twin_all"))
    orig = twin[twin.doc_id < TWIN_OFFSET].reset_index(drop=True)
    _assert_same(base, orig)


def test_shard_assign_laws(spark, queries, variant):
    base = _assert_invariant(queries, "shard_assign", spark, variant,
                             "documents")
    # sharding is a partition of the corpus: doc and char totals conserved
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert base.n_docs.sum() == len(docs)
    assert base.total_chars.sum() == docs.n_chars.sum()


def test_asof_join_laws(spark, queries, variant):
    # two-sided invariance: permute/split EITHER input relation
    base = _assert_invariant(queries, "asof_join_events_orders", spark,
                             variant, "events")
    got = _run(queries, "asof_join_events_orders", spark,
               variant("orders", "permute"))
    _assert_same(base, got)


def test_hybrid_rrf_laws(spark, queries, variant):
    base = _assert_invariant(queries, "hybrid_rrf_search", spark, variant,
                             "documents")
    # raw arithmetic recheck: rrf_score == 1/(60+rank_lex) + 1/(60+rank_sem)
    # with a null rank contributing 0 (the operator's COALESCE semantics)
    from serene_spark.operators.hybrid_search import RRF_K

    lex = base.rank_lex.astype(float)
    sem = base.rank_sem.astype(float)
    expect = ((1.0 / (RRF_K + lex)).fillna(0.0)
              + (1.0 / (RRF_K + sem)).fillna(0.0))
    np.testing.assert_allclose(base.rrf_score.astype(float), expect,
                               rtol=3e-6, atol=3e-6)
    assert sorted(base.pos) == list(range(1, len(base) + 1))


def test_kmv_rollup_laws(spark, queries, variant):
    base = _assert_invariant(queries, "kmv_rollup_users", spark, variant,
                             "events")
    # merge lemma self-check carried in the output, plus dup-invariance
    # (the sketch hashes DISTINCT user-days)
    assert base.rollup_equal.all()
    _assert_dup_law(queries, "kmv_rollup_users", spark, variant,
                    "events", base, x2=())


def test_quantile_rollup_laws(spark, queries, variant):
    base = _assert_invariant(queries, "quantile_sketch_rollup", spark,
                             variant, "events")
    assert base.rollup_equals_direct.all()


def test_triangle_counts_laws(spark, queries, variant):
    base = _assert_invariant(queries, "triangle_counts", spark, variant,
                             "lineitem")
    # the co-purchase graph is a DISTINCT edge set: duplicating every
    # fact row changes nothing
    dup = _run(queries, "triangle_counts", spark,
               variant("lineitem", "dup"))
    _assert_same(base, dup)
    assert base.total_triangles.nunique() == 1  # corpus-level constant


def test_pagerank_laws(spark, queries, variant):
    base = _assert_invariant(queries, "pagerank_converged", spark, variant,
                             "lineitem")
    dup = _run(queries, "pagerank_converged", spark,
               variant("lineitem", "dup"))
    _assert_same(base, dup)
    assert (base.pagerank > 0).all()


def test_decontaminate_laws(spark, queries, variant):
    base = _assert_invariant(queries, "decontaminate", spark, variant,
                             "documents")
    # per-doc 8-gram overlap vs the doc_id%17 benchmark split: with a
    # twin offset that PRESERVES the split, benchmark twins stay
    # benchmark (the gram set is DISTINCT, so unchanged) and train twins
    # mirror their originals exactly; originals are untouched
    twin = _run(queries, "decontaminate", spark,
                variant("documents", "twin_all_17"))
    orig = twin[twin.doc_id < TWIN_OFFSET_17].reset_index(drop=True)
    mirror = twin[twin.doc_id >= TWIN_OFFSET_17].reset_index(drop=True)
    _assert_same(base, orig)
    _assert_same(base, mirror.assign(doc_id=mirror.doc_id - TWIN_OFFSET_17))


def test_resample_downsample_laws(spark, queries, variant):
    base = _assert_invariant(queries, "resample_downsample_median", spark,
                             variant, "customer")
    # reference arm: resample every class up AND down to the integer
    # MEDIAN of class counts (middle element when odd, integer mean of
    # the two middles when even) — so every class lands EXACTLY on target
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    counts = cust.groupby("c_mktsegment").size()
    sizes = sorted(counts.values)
    k = len(sizes)
    target = (sizes[(k + 1) // 2 - 1] if k % 2 == 1
              else (sizes[k // 2 - 1] + sizes[k // 2]) // 2)
    got = base.groupby("cls").size()
    assert set(got.index) == set(counts.index)
    assert (got == target).all(), (target, dict(got))
    # original (copy_idx=0) rows per class: all of a small class, the
    # first `target` of a large one; copies only appear when upsampling
    zero = base[base.copy_idx == 0].groupby("cls").size()
    for cls, n in zero.items():
        assert n == min(int(counts[cls]), target), (cls, n)
