"""Local replica of the driver's correctness gate.

Runs each registered query on Spark AND its DuckDB oracle, then compares
row-count, column names, and values (columns sorted by name, rows sorted,
exact equality after normalizing to pandas). Usage:

    python tools/parity.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    args = ap.parse_args()

    from serene_spark.registry import load_all
    from serene_spark.session import get_spark

    queries = load_all()
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

    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
