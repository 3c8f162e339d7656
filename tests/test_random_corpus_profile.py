"""Random-corpus independent python twin for the profiling heart.

profile_scalar (SURVEY §2.3 — the reference's core 17-feature operator,
FeatureExtractorUtil.scala) was covered by fixed-data gold values +
metamorphic laws; this adds the round-11 oracle-independence tier's
third leg: a seeded RANDOM corpus whose full 17-feature output is
recomputed from scratch with python str/re/collections — no SQL, no
sqlgen shims, no DuckDB — and compared value-by-value on 3 seeds.

The corpus is deliberately hostile: every feature branch fires (emails,
currency, hyphens, valid/invalid/overlong numeric ranges, all three
date regexes plus month-name instr hits and near-miss substrings,
parens, commas, slashes, whitespace-only and empty values, NULLs via a
nullable int column, case/trim twins for the lower(trim) distinct, a
low-cardinality discrete column for the entropy branch and a unique
column for the -1 branch, and exact-binary-fraction doubles so Spark's
CAST(double AS STRING) and python str() render identically).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from serene_spark.operators.profile_scalar import (
    ASCII_LETTERS,
    DATE_PATTERNS,
    MONTH_NAMES,
    RANGE_PAT,
)
from serene_spark.registry import load_all

SEEDS = (7, 23, 91)

# string pool for c_name: every scalar-feature branch has material here
_NAME_POOL = [
    "user@example.com", "no.at.sign", "second@mail", "@",
    "$4,200", "AUD 99", "price $5", "100 dollars",
    "10-20", "999-111", "5-5", "0-0",
    "1234567890123456789-2",        # 19-digit group: fails {1,18} bound
    "12-34-56",                     # matches date rx #1, not range
    "12/31/1999", "2020-01-02", "2020-01-02 13:45:30.5",
    "2020-01-02T07:08", "13:45", "13:45:10", "99:99",
    "May 2020", "mayhem", "December", "decemberish", "junk",
    "(03) 9888", "smile)", "(open",
    "a,b,c", ",,,", "a/b/c", "01/02/03",
    "abc123", "42", "3.14", "café", "ABC", "abc ", " abc", "tab\there",
    "line\nbreak", "Customer#000001", "plain words here",
    "", "   ", "\t", " \t ",
    # typeinfer cascade material (every branch of classify_expr)
    "T", "f", "Y", "0", "1",
    "+123", "-456", "2147483647", "2147483648",      # Integer / Long split
    "9223372036854775808",                           # past int64 -> String
    "1999", "2526", "2527", "0430440622",            # year-Date / range rules
    ".5", "-0.75", "100pm", "11:59:59.9 PM", "23:61",
    "2020-01-02 13:45:30", "jan 3, 1998", "3rd of May 2001",
    "03-Mar-98", "tuesday", "August", "jan 3, 1998 10:30 pm",
]


def _make_profile_customer(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 4000)
    n = 90
    nk = rng.integers(0, 4, n).astype(object)
    nk[rng.random(n) < 0.2] = None  # NULL -> melt renders '' (missing)
    return pd.DataFrame({
        "c_custkey": np.arange(1, n + 1, dtype=np.int64),  # unique: not discrete
        "c_name": [str(rng.choice(_NAME_POOL)) for _ in range(n)],
        "c_nationkey": pd.array(nk, dtype="Int64"),
        # quarters: exact binary fractions, identical string rendering
        "c_acctbal": rng.integers(0, 4000, n) / 4.0,
        "c_mktsegment": rng.choice(["MACHINERY", "machinery ", "AUTO"], n),
    })


def _melted_values(df: pd.DataFrame, col: str) -> list[str]:
    """python twin of melt: coalesce(cast(col as string), '')."""
    out = []
    for v in df[col]:
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NA:
            out.append("")
        else:
            out.append(str(v))
    return out


def _profile_column(col: str, values: list[str]) -> dict:
    """All 17 features of one column, from scratch (str/re/Counter)."""
    date_res = [re.compile(p) for p in DATE_PATTERNS]
    alpha = set(ASCII_LETTERS)
    ws = set(" \t\n\r")

    n_values = len(values)
    # ne mirrors length(trim(value)) > 0 — SQL trim strips SPACES only
    ne = [len(v.strip(" ")) > 0 for v in values]
    n_nonempty = sum(ne)
    n_missing = n_values - n_nonempty
    total_chars = sum(len(v) for v in values)
    alpha_chars = sum(sum(1 for ch in v if ch in alpha) for v in values)
    n_at = sum(1 for v, e in zip(values, ne) if e and "@" in v)
    n_currency = sum(
        1 for v, e in zip(values, ne) if e and ("$" in v or "AUD" in v))
    n_hyphen = sum(1 for v, e in zip(values, ne) if e and "-" in v)
    n_paren = sum(
        1 for v, e in zip(values, ne) if e and ("(" in v or ")" in v))
    n_commas = sum(v.count(",") for v, e in zip(values, ne) if e)
    n_slashes = sum(v.count("/") for v, e in zip(values, ne) if e)

    def is_range(v: str) -> bool:
        m = re.search(RANGE_PAT, v)
        return bool(m) and int(m.group(1)) <= int(m.group(2))

    n_range = sum(1 for v, e in zip(values, ne) if e and is_range(v))
    sum_digit_ratio = sum(
        sum(1 for ch in v if ch.isdigit() and ch.isascii()) / len(v)
        for v in values if len(v) > 0)
    sum_ws_ratio = sum(
        sum(1 for ch in v if ch in ws) / len(v) for v in values if len(v) > 0)

    def is_date(v: str) -> bool:
        if any(r.search(v) for r in date_res):
            return True
        lv = v.lower()
        return any(m in lv for m in MONTH_NAMES)

    n_date = sum(1 for v, e in zip(values, ne) if e and is_date(v))

    # ent: per-distinct-VALUE counts of the nonempty rows
    cnt_ne = Counter(v for v, e in zip(values, ne) if e)
    tot = sum(cnt_ne.values())
    slnc = sum(c * math.log(c) for c in cnt_ne.values())
    nd_nonempty = len(cnt_ne)
    # ltd: distinct lower(trim(value)) over ALL values (incl. empties)
    n_distinct = len({v.strip(" ").lower() for v in values})

    def frac(num, den):
        return -1.0 if den == 0 else round(num / den, 6)

    discrete = n_nonempty > 0 and nd_nonempty / n_nonempty <= 0.3
    return {
        "column_name": col,
        "n_values": n_values,
        "num_unique_vals": n_distinct,
        "prop_unique_vals": round(n_distinct / n_values, 6),
        "prop_missing_vals": round(n_missing / n_values, 6),
        "ratio_alpha_chars": frac(alpha_chars, total_chars),
        "prop_entries_with_at_sign": frac(n_at, n_nonempty),
        "prop_entries_with_currency_symbol": frac(n_currency, n_nonempty),
        "prop_entries_with_hyphen": frac(n_hyphen, n_nonempty),
        "prop_entries_with_paren": frac(n_paren, n_nonempty),
        "mean_commas_per_entry": frac(n_commas, n_nonempty),
        "mean_forward_slashes_per_entry": frac(n_slashes, n_nonempty),
        "prop_range_format": frac(n_range, n_nonempty),
        "prop_numerical_chars": round(sum_digit_ratio / n_values, 6),
        "prop_whitespace_chars": round(sum_ws_ratio / n_values, 6),
        "is_discrete": 1.0 if discrete else 0.0,
        "entropy_for_discrete_values": (
            round(math.log(tot) - slnc / tot, 6) if discrete else -1.0),
        "prop_datepattern": frac(n_date, n_nonempty),
    }


@pytest.fixture(scope="module")
def profile_sf(tmp_path_factory):
    """seed -> dir holding only the hostile random customer.parquet
    (profile_scalar_customer reads nothing else)."""
    root = tmp_path_factory.mktemp("randprofile")
    made: dict[int, str] = {}

    def get(seed: int) -> str:
        if seed not in made:
            d = root / f"seed{seed}"
            d.mkdir()
            _make_profile_customer(seed).to_parquet(
                str(d / "customer.parquet"), index=False)
            made[seed] = str(d)
        return made[seed]

    return get


@pytest.mark.parametrize("seed", SEEDS)
def test_profile_scalar_vs_python(spark, profile_sf, seed):
    cust = _make_profile_customer(seed)
    want = pd.DataFrame([
        _profile_column(c, _melted_values(cust, c)) for c in cust.columns
    ]).sort_values("column_name").reset_index(drop=True)

    # corpus sanity: the branches this twin exists to check really fire
    by_col = want.set_index("column_name")
    name = by_col.loc["c_name"]
    assert 0 < name["prop_entries_with_at_sign"] < 1
    assert 0 < name["prop_entries_with_currency_symbol"] < 1
    assert 0 < name["prop_range_format"] < 1
    assert 0 < name["prop_datepattern"] < 1
    assert name["prop_missing_vals"] > 0
    assert by_col.loc["c_nationkey", "prop_missing_vals"] > 0
    assert by_col.loc["c_mktsegment", "is_discrete"] == 1.0
    assert by_col.loc["c_mktsegment", "entropy_for_discrete_values"] > 0
    assert by_col.loc["c_custkey", "is_discrete"] == 0.0
    assert by_col.loc["c_custkey", "entropy_for_discrete_values"] == -1.0

    got = (load_all()["profile_scalar_customer"].spark(spark, profile_sf(seed))
           .toPandas().sort_values("column_name").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        if want[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].astype(float), want[c].astype(float),
                rtol=0, atol=1.5e-6, err_msg=c)
        else:
            assert (got[c].values == want[c].values).all(), c


# ------------------------------------------------------------------
# §2.4 group features on the same hostile corpus: char-dist / entropy
# and the inferred-type cascade, each recomputed from scratch.

def _chardist_twin(df: pd.DataFrame):
    """(chardist rows, entropy rows) — python str/Counter only."""
    cd_rows, ent_rows = [], []
    for col in df.columns:
        counts = Counter()
        for v in _melted_values(df, col):
            if len(v.strip(" ")) > 0:       # NONEMPTY filter
                counts.update(v)            # per-char, value-weighted
        if not counts:
            continue
        l2 = math.sqrt(sum(c * c for c in counts.values()))
        for ch, c in sorted(counts.items()):
            cd_rows.append((col, ch, c, round(c / l2, 6)))
        tot = sum(counts.values())
        slog = sum(c * math.log2(c) for c in counts.values())
        ent_rows.append((col, tot, len(counts),
                         round((math.log2(tot) - slog / tot) / math.log2(98), 6)))
    cd = pd.DataFrame(cd_rows, columns=["column_name", "ch", "cnt", "freq_l2"])
    ent = pd.DataFrame(ent_rows, columns=[
        "column_name", "total_chars", "n_distinct_chars",
        "shannon_char_entropy"])
    return cd, ent


@pytest.mark.parametrize("seed", SEEDS)
def test_chardist_and_entropy_vs_python(spark, profile_sf, seed):
    cust = _make_profile_customer(seed)
    want_cd, want_ent = _chardist_twin(cust)
    qs = load_all()
    got_cd = (qs["chardist_customer"].spark(spark, profile_sf(seed)).toPandas()
              .sort_values(["column_name", "ch"]).reset_index(drop=True))
    want_cd = (want_cd.sort_values(["column_name", "ch"])
               .reset_index(drop=True))
    assert len(got_cd) == len(want_cd)
    assert (got_cd.column_name.values == want_cd.column_name.values).all()
    assert (got_cd.ch.values == want_cd.ch.values).all()
    assert (got_cd.cnt.values == want_cd.cnt.values).all()
    np.testing.assert_allclose(got_cd.freq_l2, want_cd.freq_l2,
                               rtol=0, atol=1.5e-6)

    got_ent = (qs["char_entropy_customer"].spark(spark, profile_sf(seed))
               .toPandas().sort_values("column_name").reset_index(drop=True))
    want_ent = want_ent.sort_values("column_name").reset_index(drop=True)
    assert (got_ent.column_name.values == want_ent.column_name.values).all()
    assert (got_ent.total_chars.values == want_ent.total_chars.values).all()
    assert (got_ent.n_distinct_chars.values
            == want_ent.n_distinct_chars.values).all()
    np.testing.assert_allclose(got_ent.shannon_char_entropy,
                               want_ent.shannon_char_entropy,
                               rtol=0, atol=1.5e-6)


def _classify(raw: str) -> str:
    """python twin of classify_expr's cascade (DataTypeParser semantics)."""
    from serene_spark.operators.profile_typeinfer import (
        DATETIME_PAT,
        DATE_PAT,
        FLOAT_PAT,
        INT_PAT,
        NL_DATETIME1,
        NL_DATETIME2,
        NL_DATE_DMY,
        NL_DATE_MDY,
        NL_DATE_MY,
        NL_MONTH_ONLY,
        NUM_DT_1,
        NUM_DT_2,
        TIME_AMPM_PAT,
        TIME_PAT,
        WEEKDAY_PAT,
    )

    v = raw.strip(" ")                      # trim(value) — spaces only
    lv = v.lower()
    if re.search(FLOAT_PAT, v):
        return "Float"
    if v in ("0", "1", "T", "F", "t", "f", "Y", "N", "y", "n"):
        return "Boolean"
    if re.search(INT_PAT, v):
        big = int(v)
        if len(v) == 4 and 1500 <= big <= 2526:
            return "Date"
        if -2147483648 <= big <= 2147483647:
            return "Integer"
        if -(2**63) <= big <= 2**63 - 1:
            return "Long"
        return "String"                     # TRY_CAST overflow -> NULL
    if re.search(TIME_PAT, v) or re.search(TIME_AMPM_PAT, v):
        return "Time"
    if re.search(DATETIME_PAT, v):
        return "DateTime"
    if any(re.search(p, lv) for p in
           (NL_DATETIME1, NL_DATETIME2, NUM_DT_1, NUM_DT_2)):
        return "DateTime"
    if re.search(DATE_PAT, v):
        return "Date"
    if any(re.search(p, lv) for p in
           (NL_DATE_MDY, NL_DATE_MY, NL_DATE_DMY, WEEKDAY_PAT,
            NL_MONTH_ONLY)):
        return "Date"
    return "String"


@pytest.mark.parametrize("seed", SEEDS)
def test_typeinfer_vs_python(spark, profile_sf, seed):
    cust = _make_profile_customer(seed)
    rows = []
    seen_types = set()
    for col in cust.columns:
        votes = Counter()
        for v in _melted_values(cust, col):
            if len(v.strip(" ")) > 0:
                votes.update([_classify(v)])
        seen_types |= set(votes)
        n = sum(votes.values())
        # majority vote, ties broken by (votes DESC, inferred ASC)
        win = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((col, win[0], win[1], round(win[1] / n, 6)))
    # corpus sanity: the pool drives every cascade outcome SOMEWHERE in
    # the per-value classification (majority vote then collapses)
    assert {"Float", "Boolean", "Integer", "Long", "Time", "DateTime",
            "Date", "String"} <= {
        _classify(v) for v in _NAME_POOL if v.strip(" ")}
    want = (pd.DataFrame(rows, columns=[
        "column_name", "inferred_type", "type_votes", "type_prop"])
        .sort_values("column_name").reset_index(drop=True))

    got = (load_all()["typeinfer_customer"].spark(spark, profile_sf(seed))
           .toPandas().sort_values("column_name").reset_index(drop=True))
    assert (got.column_name.values == want.column_name.values).all()
    assert (got.inferred_type.values == want.inferred_type.values).all()
    assert (got.type_votes.values == want.type_votes.values).all()
    np.testing.assert_allclose(got.type_prop, want.type_prop,
                               rtol=0, atol=1.5e-6)
