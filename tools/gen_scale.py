"""Scale-up data generator: same schemas / key relationships / distribution
shapes as the driver's /root/testdata tables, at arbitrary SF.

The driver's generator (seed 42) is external; this one mirrors what the
timing curves depend on — row counts per table, key fan-outs (Poisson(4)
lineitem lines per order, uniform foreign keys), value distributions
(uniform order prices, lognormal unit prices, exponential event values),
the documents near-dup/exact-dup rates (~5% / ~0.3%), and the weak-cluster
unit-norm embeddings — so sf1/sf3 runs exercise the same plan shapes and
data skew as the driver's sf0.1 bench, just bigger.  It is NOT for parity
(values differ from the driver's seed); use it only for scale validation.

Usage: python tools/gen_scale.py SF OUTDIR  (e.g. 1.0 /root/repo/scale_data/sf1)

Embedding contrast modes (round-10 ANN ledger v2):
  python tools/gen_scale.py SF OUTDIR --embeddings-only --contrast high
``low`` (default, the historic corpus) has 10 centroids at 0.55 signal
under unit-norm 64-d N(0,1) noise — signal/noise ~ 0.07, i.e. nearly
isotropic, which is why the round-9 recall ledger found recall ~ scan
fraction for every index. ``high`` mirrors REAL text-embedding geometry:
256 topic clusters, members at cosine ~ 0.8 to their centroid
(x = c + 0.5-norm noise), between-cluster cosine ~ 0. The ANN indexes'
bucketing assumptions hold only on such clustered data; the ledger
measures both."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

SEED = 4242
VOCAB = [
    "stream", "line", "value", "a", "small", "table", "vector", "window",
    "scan", "batch", "customer", "spark", "column", "filter", "fast", "slow",
    "join", "order", "group", "row", "key", "hash", "sort", "agg", "query",
    "big", "part", "merge", "shuffle", "plan", "page",
]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
EPOCH = pd.Timestamp("1970-01-01")


def write(df: pd.DataFrame, outdir: str, name: str) -> None:
    # driver tables are TIMESTAMP(MICROS); pandas defaults to nanos, which
    # Spark surfaces as BIGINT without a legacy conf — downcast to match
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df.to_parquet(os.path.join(outdir, f"{name}.parquet"), index=False)
    print(f"  {name}: {len(df)} rows")


def gen_embeddings(
    sf: float, outdir: str, contrast: str = "low", rng=None
) -> None:
    """Write embeddings.parquet at the given contrast (docstring above)."""
    if rng is None:
        rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)
    n_emb = int(20_000 * sf)
    if contrast == "high":
        n_clusters = 256
        cents = rng.normal(0, 1, (n_clusters, 64))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        lab = rng.integers(0, n_clusters, n_emb).astype(np.int32)
        # member-to-centroid cosine ~ 1/sqrt(1+0.5^2) ~ 0.89,
        # member-to-member (same cluster) ~ 1/(1+0.5^2) ~ 0.8
        X = cents[lab] + rng.normal(0, 0.5 / np.sqrt(64), (n_emb, 64))
    else:
        lab = rng.integers(0, 10, n_emb).astype(np.int32)
        cents = rng.normal(0, 1, (10, 64))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        X = rng.normal(0, 1, (n_emb, 64)) + 0.55 * cents[lab]
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    write(pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
        "label": lab,
    }), outdir, "embeddings")


def gen(sf: float, outdir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    write(pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }), outdir, "region")
    write(pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }), outdir, "nation")
    write(pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }), outdir, "customer")
    write(pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }), outdir, "supplier")
    write(pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{a} {b}" for a, b in zip(rng.choice(P_ADJ, n_part),
                                              rng.choice(P_NOUN, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(P_TYPE, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }), outdir, "part")

    odate = (pd.Timestamp("1995-01-01")
             + pd.to_timedelta(rng.integers(0, 2405, n_ord), unit="D"))
    write(pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }), outdir, "orders")

    # uniform orderkey draws => Poisson(4) lines per order, ~1.8% childless
    l_ord = rng.integers(0, n_ord, n_li).astype(np.int64)
    qty = rng.integers(1, 51, n_li).astype(float)
    unit = np.exp(rng.normal(7.63, 1.29, n_li))
    write(pd.DataFrame({
        "l_orderkey": l_ord,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 4),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["N", "R", "A"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": (odate.values[l_ord]
                       + rng.integers(1, 96, n_li) * np.timedelta64(1, "D")),
    }), outdir, "lineitem")

    ts = (pd.Timestamp("2024-01-01").value // 1000
          + rng.integers(0, 30 * 86400 * 10**6, n_ev))
    write(pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.to_datetime(np.sort(ts), unit="us"),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(np.minimum(rng.exponential(50, n_ev), 560.0), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }), outdir, "events")

    # documents: random 31-word text; ~5% near-dup copies (few-word
    # mutation of an earlier doc — LSH candidates), ~0.3% exact dups
    lens = rng.integers(8, 108, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        u = rng.random()
        if i > 10 and u < 0.003:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and u < 0.05:
            base = texts[int(rng.integers(0, i))].split()
            for _ in range(max(1, len(base) // 20)):
                base[int(rng.integers(0, len(base)))] = VOCAB[int(rng.integers(0, 31))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, 31, lens[i])))
    write(pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), outdir, "documents")

    gen_embeddings(sf, outdir, "low", rng)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    contrast = "high" if "--contrast=high" in flags or (
        "--contrast" in flags and "high" in args) else "low"
    if "high" in args:
        args.remove("high")
    if "--embeddings-only" in flags:
        gen_embeddings(float(args[0]), args[1], contrast)
    else:
        gen(float(args[0]), args[1])
