"""Markov removal-effect attribution (operators/attribution_markov.py).

Oracle parity (Spark == DuckDB bit-for-bit on the quantized trajectory)
runs in the driver gate; these pin the math against an independent pandas/
numpy reference — journeys walked imperatively, absorption solved EXACTLY
as a linear system (I - Q)p = b, no iteration — plus the structural
invariants of a removal-effect model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"
CONV, NULL, START = "__conv", "__null", "__start"


def _journey_chain(spark):
    """Transition counts computed imperatively: per user, the time-ordered
    path truncated at the first purchase; never-purchasers absorb to null."""
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    counts: dict[tuple[str, str], int] = {}

    def bump(s, d):
        counts[(s, d)] = counts.get((s, d), 0) + 1

    for _, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        if "purchase" in types:
            types = types[: types.index("purchase") + 1]
        path = [t if t != "purchase" else CONV for t in types]
        bump(START, path[0])
        for a, b in zip(path, path[1:]):
            bump(a, b)
        if path[-1] != CONV:
            bump(path[-1], NULL)
    return counts


def _exact_absorption(counts):
    """P(conv | start) per scenario via the EXACT linear system — an
    independent check that the unrolled iterations have converged."""
    chans = sorted({s for s, _ in counts if s != START})
    probs = {}
    for (s, d), n in counts.items():
        tot = sum(v for (ss, _), v in counts.items() if ss == s)
        probs[(s, d)] = n / tot

    def p_conv(removed=None):
        states = [c for c in chans if c != removed]
        idx = {c: i for i, c in enumerate(states)}
        n = len(states)
        q = np.zeros((n, n))
        b = np.zeros(n)
        for (s, d), p in probs.items():
            if s == START or s == removed:
                continue
            if d == CONV:
                b[idx[s]] += p
            elif d in idx and d != removed:
                q[idx[s], idx[d]] += p
        v = np.linalg.solve(np.eye(n) - q, b)
        out = 0.0
        for (s, d), p in probs.items():
            if s != START:
                continue
            if d == CONV:
                out += p
            elif d in idx:
                out += p * v[idx[d]]
        return out

    base = p_conv()
    effects = {c: 1 - p_conv(c) / base for c in chans}
    return base, effects


def test_matches_exact_linear_solution(spark):
    out = load_all()["attribution_markov_removal"].spark(spark, SF).toPandas()
    base, effects = _exact_absorption(_journey_chain(spark))
    assert set(out["channel"]) == set(effects)
    # 40 quantized iterations vs the exact fixed point: geometric residual
    # (spectral radius ~0.78 on this chain -> ~3e-5) plus 9-dp quantization.
    assert abs(out["base_p_conv"].iloc[0] - base) < 3e-4
    pos_sum = sum(max(e, 0.0) for e in effects.values())
    for _, row in out.iterrows():
        e = effects[row["channel"]]
        assert abs(row["removal_effect"] - e) < 5e-4, row
        assert abs(row["attribution_share"] - max(e, 0) / pos_sum) < 1e-3, row


def test_structural_invariants(spark):
    out = load_all()["attribution_markov_removal"].spark(spark, SF).toPandas()
    # one row per non-absorbing channel, no purchase/absorber rows
    assert not set(out["channel"]) & {"purchase", CONV, NULL, START}
    assert out["base_p_conv"].nunique() == 1
    assert 0 < out["base_p_conv"].iloc[0] <= 1
    # removing a channel can only remove conversion paths
    assert (out["removal_effect"] >= 0).all()
    assert (out["removal_effect"] <= 1).all()
    assert abs(out["attribution_share"].sum() - 1.0) < 1e-4


def test_oracle_dialects_agree_on_shape():
    q = load_all()["attribution_markov_removal"]
    assert q.oracle.count("MATERIALIZED") == 8  # 3 bases + 4 chunk terminals + p_start
    from serene_spark.operators.attribution_markov import _all_bases

    for name, body in _all_bases("spark"):
        assert "MATERIALIZED" not in body, name
