"""Local replica of the driver's correctness gate.

Runs each registered query on Spark AND its DuckDB oracle, then compares
row-count, column names, and values (columns sorted by name, rows sorted,
exact equality after normalizing to pandas). Usage:

    python tools/parity.py [--sf DIR] [name ...]
    python tools/parity.py --changed     # only queries whose module changed

``--changed`` keeps the full sweep cheap to run per-session: a green run
records each passed query's defining-module content hash (plus a hash of the
shared SQL/catalog infra) in ``.parity_green.json``; the next ``--changed``
run selects only queries whose module hash moved — or everything, if the
shared infra moved. The state file updates per passed query; the shared-infra
hash updates only on a run that covered every registered query, so a partial
run can never mark untouched queries fresh.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STATE_PATH = os.path.join(REPO, ".parity_green.json")
# changes here can affect every query's SQL or input plumbing
SHARED_INFRA = (
    "serene_spark/functions",
    "serene_spark/catalog.py",
    "serene_spark/session.py",
    "serene_spark/registry.py",
)


def _file_hash(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()[:16]


def _shared_hash() -> str:
    h = hashlib.sha256()
    for rel in SHARED_INFRA:
        p = os.path.join(REPO, rel)
        files = (
            sorted(
                os.path.join(r, f)
                for r, _d, fs in os.walk(p)
                for f in fs
                if f.endswith(".py")
            )
            if os.path.isdir(p)
            else [p]
        )
        for f in files:
            h.update(f.encode())
            with open(f, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()[:16]


_DEP_CACHE: dict[str, tuple[str, ...]] = {}


def _module_file(name: str) -> str | None:
    """serene_spark dotted module name -> source file (module or package)."""
    base = os.path.join(REPO, name.replace(".", os.sep))
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.isfile(cand):
            return cand
    return None


def _dep_closure(path: str) -> tuple[str, ...]:
    """Transitive serene_spark imports of a source file, BY SOURCE TEXT —
    runtime dict inspection would miss function-level imports, which is
    exactly how cross-module SQL splicing happens (curriculum_plan splices
    text_quality_sql, split_leakage_audit splices lsh_verified_sql): an
    edit to the spliced module must mark the dependent queries stale."""
    import re

    if path in _DEP_CACHE:
        return _DEP_CACHE[path]
    _DEP_CACHE[path] = ()  # break import cycles during recursion
    try:
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
    except OSError:
        return ()
    deps: set[str] = {path}
    for m in re.finditer(r"(?:from|import)\s+(serene_spark[\w.]*)", src):
        f = _module_file(m.group(1))
        if f:
            deps.update(_dep_closure(f))
            deps.add(f)
    out = tuple(sorted(deps))
    _DEP_CACHE[path] = out
    return out


def _module_hash(q) -> str:
    """Content hash of the defining module AND every serene_spark module it
    (transitively) imports, so cross-module SQL composition cannot leave a
    dependent query falsely green."""
    mod = sys.modules[q.spark.__module__]
    h = hashlib.sha256()
    for f in _dep_closure(mod.__file__):
        h.update(f.encode())
        h.update(_file_hash(f).encode())
    return h.hexdigest()[:16]


def _load_state() -> dict:
    try:
        with open(STATE_PATH, encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns spark={scols} oracle={ocols}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa = pd.to_numeric(a, errors="coerce")
                bb = pd.to_numeric(b, errors="coerce")
                neq = ~((aa == bb) | (aa.isna() & bb.isna()))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--changed",
        action="store_true",
        help="run only queries whose defining module changed since their "
        "last green run (all queries if the shared infra changed)",
    )
    args = ap.parse_args()

    from serene_spark.registry import load_all
    from serene_spark.session import get_spark

    queries = load_all()
    state = _load_state()
    shared = _shared_hash()
    if args.changed:
        if args.names:
            ap.error("--changed and explicit names are mutually exclusive")
        if state.get("__shared__") != shared:
            names = list(queries)
            print(f"--changed: shared infra moved -> full sweep ({len(names)})")
        else:
            names = [
                n for n, q in queries.items()
                if state.get("queries", {}).get(n) != _module_hash(q)
            ]
            print(f"--changed: {len(names)}/{len(queries)} queries stale")
            if not names:
                print("\n0/0 passed (nothing stale)")
                return 0
    else:
        names = args.names or list(queries)
    spark = get_spark("parity", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))

    con = duckdb.connect()
    from serene_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failed = []
    for name in names:
        q = queries.get(name)
        if q is None:
            print(f"[SKIP] {name}: not registered")
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, args.sf).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"[OK·rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception:
            print(f"[FAIL] {name}: oracle raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"    {p}")
            failed.append(name)
        else:
            print(f"[OK] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    # record green hashes: per passed query always; the shared-infra hash
    # only when this run covered the whole registry
    qstate = state.setdefault("queries", {})
    for name in names:
        if name in failed or name not in queries:
            continue
        qstate[name] = _module_hash(queries[name])
    if not failed and set(names) >= set(queries):
        state["__shared__"] = shared
    try:
        with open(STATE_PATH, "w", encoding="utf-8") as fh:
            json.dump(state, fh, indent=0, sort_keys=True)
    except OSError:
        pass

    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
