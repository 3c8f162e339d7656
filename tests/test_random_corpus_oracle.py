"""Random-corpus tests against INDEPENDENT python references.

Second compensating control for the shared-SQL oracle blind spot (the
first is tests/test_metamorphic_sql.py's laws): these tests generate
seeded RANDOM corpora and recompute each operator's full output with a
from-scratch python implementation — hashlib/re/collections, sharing no
SQL, no sqlgen shims, and no DuckDB with the engine under test. A
semantic bug in the shared generated SQL passes Spark-vs-DuckDB parity
by construction; it cannot pass a hashlib twin on corpora it has never
seen.

Covered with full-output value equality on 3 seeds each: exact dedup
(md5 over the documented normalization, including injected dup groups
that differ only in case/whitespace), text_quality (token/char/ratio
formulas + the gate), lang_id (stopword-hit argmax with the documented
tie-break), stratified_sample (md5-threshold draw), shard_assign
(md5-mod-16 partition manifest), KMV NDV sketch (52-bit md5 bottom-K
over distinct user-days, exercising BOTH the exact-below-K and
estimator-above-K branches), and textlen stats (count-based ceil(n/2)
median, max-count/smallest-tie mode) over a random melted customer.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from serene_spark.catalog import TABLES
from serene_spark.operators.text_analysis import STOPWORDS
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"
SEEDS = (7, 23, 91)

_WORDS = (
    # english + other-language stopwords so lang-id/quality paths fire,
    # plus casing/digit/punctuation material
    list(STOPWORDS["en"]) + list(STOPWORDS["de"]) + list(STOPWORDS["fr"])
    + list(STOPWORDS["es"])
    + ["Data", "SPARK", "table42", "x9", "Merge,", "row.", "12.5", "N/A",
       "hello!", "WORLD", "(nested)", "a-b", "100%", "semi;colon"]
)


def _norm(text: str) -> str:
    return re.sub(r"[ \t\n\r]+", " ", text.lower()).strip()


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", _norm(text)) if t]


def _u01(key) -> float:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32


def _make_docs(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(80):
        n = int(rng.integers(3, 40))
        words = list(rng.choice(_WORDS, size=n))
        text = " ".join(words)
        if i % 11 == 5:
            text = "  " + text + "   "  # whitespace edge
        if i % 17 == 9:
            text = "!!! ??? ..."  # zero tokens after normalization
        if i % 7 == 3 and i >= 7:
            # exact dup of doc i-7 modulo case + whitespace (same fp)
            base = rows[i - 7][1]
            text = "  " + base.upper().replace(" ", "  ") + " "
        lang = str(rng.choice(["en", "de", "fr", "es", "zh"]))
        rows.append((i, text, lang, f"src{int(rng.integers(0, 4))}",
                     len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def _make_events(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1000)
    n = 3000
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 12 * 86400 * 1000, n), unit="ms"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, 120, n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup", "error"], n),
        # integer cents: the double is within 1e-13 of an exact 2-dec
        # value, so DECIMAL(18,2) casts and python Decimal twins agree
        "value": rng.integers(0, 100_000, n) / 100.0,
        "props": np.array([f"p{i % 5}" for i in range(n)]),
    })


def _make_lineitem(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3000)
    n = 2500
    ship = (pd.Timestamp("2001-01-01")
            + pd.to_timedelta(rng.integers(0, 500, n), unit="D"))
    return pd.DataFrame({
        "l_orderkey": rng.integers(1, 700, n).astype(np.int64),
        "l_partkey": rng.integers(1, 200, n).astype(np.int64),
        "l_suppkey": rng.integers(1, 15, n).astype(np.int64),
        "l_linenumber": rng.integers(1, 7, n).astype(np.int64),
        "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        "l_extendedprice": rng.integers(100, 9_000_000, n) / 100.0,
        "l_discount": rng.integers(0, 11, n) / 100.0,
        "l_tax": rng.integers(0, 9, n) / 100.0,
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["O", "F"], n),
        "l_shipdate": ship.astype("datetime64[us]"),  # straddles the
        # Q1 cutoff (2001-09-01) so the WHERE is genuinely exercised
    })


def _make_customer(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 2000)
    n = 60
    return pd.DataFrame({
        "c_custkey": np.arange(1, n + 1, dtype=np.int64),
        "c_name": [f"Customer#{int(rng.integers(0, 10**int(rng.integers(1, 9))))}"
                   for _ in range(n)],
        "c_nationkey": rng.integers(0, 25, n).astype(np.int64),
        # quarters are exact binary fractions: CAST(double AS STRING) and
        # python str() agree on every value
        "c_acctbal": (rng.integers(0, 4000, n) / 4.0),
        "c_mktsegment": rng.choice(
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD"], n),
    })


@pytest.fixture(scope="module")
def rand_sf(tmp_path_factory):
    """seed -> sf_dir with random documents/events/customer, rest symlinked."""
    root = tmp_path_factory.mktemp("randcorpus")
    made: dict[int, str] = {}

    def get(seed: int) -> str:
        if seed in made:
            return made[seed]
        d = root / f"seed{seed}"
        d.mkdir()
        _make_docs(seed).to_parquet(str(d / "documents.parquet"), index=False)
        _make_events(seed).to_parquet(str(d / "events.parquet"), index=False)
        _make_customer(seed).to_parquet(str(d / "customer.parquet"), index=False)
        _make_lineitem(seed).to_parquet(str(d / "lineitem.parquet"), index=False)
        for t in TABLES:
            if t not in ("documents", "events", "customer", "lineitem"):
                os.symlink(f"{SF}/{t}.parquet", str(d / f"{t}.parquet"))
        made[seed] = str(d)
        return made[seed]

    return get


@pytest.fixture(scope="module")
def queries():
    return load_all()


def _got(queries, name, spark, sf, sort_keys):
    return (queries[name].spark(spark, sf).toPandas()
            .sort_values(sort_keys).reset_index(drop=True))


def _check(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in want.columns:
        if want[c].dtype.kind in "f":
            np.testing.assert_allclose(
                got[c].astype(float), want[c].astype(float),
                rtol=0, atol=1.5e-6, err_msg=c)
        else:
            assert (got[c].values == want[c].values).all(), c


# ------------------------------------------------------------------ tests

@pytest.mark.parametrize("seed", SEEDS)
def test_dedup_exact_vs_hashlib(spark, queries, rand_sf, seed):
    docs = _make_docs(seed)
    fp = docs.text.map(lambda t: hashlib.md5(_norm(t).encode()).hexdigest())
    grp = (docs.assign(text_hash=fp).groupby("text_hash")
           .agg(n_docs=("doc_id", "size"), keeper_doc_id=("doc_id", "min"))
           .reset_index().sort_values("text_hash").reset_index(drop=True))
    # the injected dup groups exist (the normalization path is exercised):
    # the i%7 case/whitespace twins CHAIN into one large group, and the
    # zero-token docs share one fp
    assert (grp.n_docs >= 2).sum() >= 2
    assert grp.n_docs.max() >= 5
    got = _got(queries, "dedup_exact", spark, rand_sf(seed), ["text_hash"])
    _check(got, grp)


@pytest.mark.parametrize("seed", SEEDS)
def test_text_quality_vs_python(spark, queries, rand_sf, seed):
    docs = _make_docs(seed)
    rows = []
    for r in docs.itertuples():
        toks = _tokens(r.text)
        if not toks:  # inner join vs tok_stats drops token-less docs
            continue
        n_chars = len(r.text)
        punct = len(re.sub(r"[a-zA-Z0-9 \t\n\r]", "", r.text))
        digit = len(re.sub(r"[^0-9]", "", r.text))
        upper = len(re.sub(r"[^A-Z]", "", r.text))
        sw = sum(1 for t in toks if t in STOPWORDS["en"])
        n_tok = len(toks)
        gate = (5 <= n_tok <= 100000 and sw / n_tok >= 0.01
                and punct / n_chars <= 0.2)
        rows.append((r.doc_id, n_chars, n_tok,
                     round(sum(map(len, toks)) / n_tok, 6),
                     round(punct / n_chars, 6), round(digit / n_chars, 6),
                     round(upper / n_chars, 6), round(sw / n_tok, 6),
                     1.0 if gate else 0.0))
    want = pd.DataFrame(rows, columns=[
        "doc_id", "n_chars", "n_tokens", "avg_token_len", "punct_ratio",
        "digit_ratio", "upper_ratio", "stopword_ratio", "quality_pass"])
    assert len(want) < 80  # the zero-token docs really are dropped
    got = _got(queries, "text_quality", spark, rand_sf(seed), ["doc_id"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_lang_id_vs_python(spark, queries, rand_sf, seed):
    docs = _make_docs(seed)
    rows = []
    for r in docs.itertuples():
        toks = _tokens(r.text)
        if not toks:
            continue
        hits = {lang: sum(1 for t in toks if t in ws)
                for lang, ws in STOPWORDS.items()}
        best = max(hits.values())
        if best == 0:
            pred = "unknown"
        elif hits["de"] == best:  # the operator's documented tie-break
            pred = "de"
        elif hits["en"] == best:
            pred = "en"
        elif hits["es"] == best:
            pred = "es"
        else:
            pred = "fr"
        rows.append((r.doc_id, hits["en"], hits["de"], hits["fr"],
                     hits["es"], pred))
    want = pd.DataFrame(rows, columns=[
        "doc_id", "en_hits", "de_hits", "fr_hits", "es_hits", "pred_lang"])
    got = _got(queries, "lang_id", spark, rand_sf(seed), ["doc_id"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_stratified_sample_vs_python(spark, queries, rand_sf, seed):
    from serene_spark.operators.curation import SAMPLE_RATES

    docs = _make_docs(seed)
    u = docs.doc_id.map(_u01)
    rate = docs.lang.map(lambda lg: SAMPLE_RATES.get(lg, 0.0))
    want = (docs.assign(u=u.round(6))[u < rate]
            [["doc_id", "lang", "source", "u"]]
            .sort_values("doc_id").reset_index(drop=True))
    assert 0 < len(want) < len(docs)
    got = _got(queries, "stratified_sample", spark, rand_sf(seed), ["doc_id"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_shard_assign_vs_python(spark, queries, rand_sf, seed):
    from serene_spark.operators.curation import N_SHARDS

    docs = _make_docs(seed)
    shard = docs.doc_id.map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
        % N_SHARDS)
    want = (docs.assign(shard=shard.astype(np.int32)).groupby("shard")
            .agg(n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"),
                 first_doc=("doc_id", "min"))
            .reset_index().sort_values("shard").reset_index(drop=True))
    got = _got(queries, "shard_assign", spark, rand_sf(seed), ["shard"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_kmv_ndv_vs_hashlib(spark, queries, rand_sf, seed):
    from serene_spark.operators.sketches import KMV_K

    ev = _make_events(seed)
    secs = ((ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
            .map(math.floor).astype(np.int64))
    key = (ev.user_id.astype(str) + "|" + (secs // 86400).astype(str))
    rows = []
    estimator_hit = False
    for etype in sorted(ev.event_type.unique()):
        keys = set(key[ev.event_type == etype])
        ndv = len(keys)
        us = sorted(
            (int(hashlib.md5(k.encode()).hexdigest()[:13], 16) + 0.5) / 2**52
            for k in keys)
        sk = us[:KMV_K]
        c = len(sk)
        est = float(c) if c < KMV_K else (KMV_K - 1) / sk[-1]
        estimator_hit = estimator_hit or c == KMV_K
        rows.append((etype, ndv, c, round(est, 6),
                     round(abs(est - ndv) / ndv, 6)))
    assert estimator_hit  # at least one type exceeds K: estimator branch ran
    want = pd.DataFrame(rows, columns=[
        "event_type", "ndv_exact", "sketch_size", "ndv_est", "rel_err"])
    got = _got(queries, "kmv_ndv_users", spark, rand_sf(seed), ["event_type"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_q1_pricing_vs_decimal_python(spark, queries, rand_sf, seed):
    from decimal import Decimal

    li = _make_lineitem(seed)
    cutoff = pd.Timestamp("2001-09-01")
    kept = li[li.l_shipdate <= cutoff]
    assert 0 < len(kept) < len(li)  # the WHERE really filters
    rows = []
    for (rf, ls), g in kept.groupby(["l_returnflag", "l_linestatus"]):
        q = sum(Decimal(str(v)) for v in g.l_quantity)
        p = sum(Decimal(str(v)) for v in g.l_extendedprice)
        disc = [Decimal(str(v)) for v in g.l_discount]
        tax = [Decimal(str(v)) for v in g.l_tax]
        price = [Decimal(str(v)) for v in g.l_extendedprice]
        dp = sum(pp * (1 - d) for pp, d in zip(price, disc))
        ch = sum(pp * (1 - d) * (1 + t)
                 for pp, d, t in zip(price, disc, tax))
        n = len(g)
        rows.append((rf, ls, float(q), float(p), float(dp), float(ch),
                     round(float(q) / n, 6), round(float(p) / n, 6),
                     round(float(sum(disc)) / n, 6), n))
    want = (pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
        "avg_disc", "count_order"])
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True))
    got = _got(queries, "q1_pricing_summary", spark, rand_sf(seed),
               ["l_returnflag", "l_linestatus"])
    # exact-decimal sums are large (~1e7): widen to relative tolerance
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        if want[c].dtype.kind == "f":
            np.testing.assert_allclose(got[c], want[c], rtol=1e-9,
                                       atol=1.5e-6, err_msg=c)
        else:
            assert (got[c].values == want[c].values).all(), c


@pytest.mark.parametrize("seed", SEEDS)
def test_tumbling_hour_vs_python(spark, queries, rand_sf, seed):
    from decimal import Decimal

    ev = _make_events(seed)
    hour = ev.ts.dt.floor("h")
    rows = []
    for (h, et), g in ev.groupby([hour, ev.event_type]):
        rows.append((h.strftime("%Y-%m-%d %H:%M:%S"), et, len(g),
                     float(sum(Decimal(str(v)) for v in g.value)),
                     g.user_id.nunique()))
    want = (pd.DataFrame(rows, columns=[
        "window_start", "event_type", "n_events", "sum_value", "n_users"])
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True))
    got = _got(queries, "events_tumbling_hour", spark, rand_sf(seed),
               ["window_start", "event_type"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_textlen_stats_vs_python(spark, queries, rand_sf, seed):
    cust = _make_customer(seed)
    rows = []
    for col in ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment"]:
        lens = [len(str(v)) for v in cust[col]]
        n = len(lens)
        counts = Counter(lens)
        cum, median = 0, None
        for ln in sorted(counts):
            cum += counts[ln]
            if cum >= math.ceil(n / 2):
                median = ln
                break
        mode = min(ln for ln, c in counts.items()
                   if c == max(counts.values()))
        rows.append((col, n, round(sum(lens) / n, 6), median, mode,
                     min(lens), max(lens)))
    want = (pd.DataFrame(rows, columns=[
        "column_name", "n_values", "mean_len", "median_len", "mode_len",
        "min_len", "max_len"])
        .sort_values("column_name").reset_index(drop=True))
    got = _got(queries, "textlen_stats_customer", spark, rand_sf(seed),
               ["column_name"])
    _check(got, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_quantile_sketch_vs_python(spark, queries, rand_sf, seed):
    """Full-output twin of the bottom-K coordinated-sample quantile
    sketch: md5(event_id) row draw, bottom-256 sample per type, and BOTH
    the sample and exact count-based p50/p90/p99 (min v with cumcount >=
    ceil(p*n)) recomputed from scratch on integer cents."""
    from serene_spark.operators.sketches import QSK_K

    ev = _make_events(seed)
    rows = []
    sampled_path = False
    for etype in sorted(ev.event_type.unique()):
        sub = ev[ev.event_type == etype]
        # exact cents (the DECIMAL(18,2) cast) keyed by row
        cents = [(int(e), round(v * 100)) for e, v in zip(sub.event_id, sub.value)]
        n = len(cents)

        def qs(cvals):
            m = len(cvals)
            counts = Counter(cvals)
            out = []
            for p in (0.50, 0.90, 0.99):
                need, cum = math.ceil(p * m), 0
                for c in sorted(counts):
                    cum += counts[c]
                    if cum >= need:
                        out.append(c / 100)
                        break
            return out

        exact = qs([c for _, c in cents])
        us = sorted(
            ((int(hashlib.md5(str(e).encode()).hexdigest()[:13], 16) + 0.5)
             / 2**52, c) for e, c in cents)
        sample = [c for _, c in us[:QSK_K]]
        sampled_path = sampled_path or n > QSK_K
        est = qs(sample)
        rows.append((
            etype, n, len(sample),
            exact[0], est[0], round(abs(est[0] - exact[0]) / exact[0], 6),
            exact[1], est[1], round(abs(est[1] - exact[1]) / exact[1], 6),
            exact[2], est[2], round(abs(est[2] - exact[2]) / exact[2], 6)))
    assert sampled_path  # at least one type genuinely samples (n > K)
    want = pd.DataFrame(rows, columns=[
        "event_type", "n", "sample_n", "p50", "p50_est", "p50_rel_err",
        "p90", "p90_est", "p90_rel_err", "p99", "p99_est", "p99_rel_err"])
    got = _got(queries, "quantile_sketch_bottomk", spark, rand_sf(seed),
               ["event_type"])
    _check(got, want)
