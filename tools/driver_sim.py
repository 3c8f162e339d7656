"""Vanilla-session driver simulation — the closest local replica of what
the external correctness driver actually does.

``tools/parity.py`` uses the engine's own tuned session; the REAL driver
builds a vanilla SparkSession (no timezone/nanos/AQE confs), imports
``__spark_entry__``, and runs queries()/oracle_sql() side by side. This
tool does exactly that: a bare session (the engine must self-tune via
``tune_session`` at runtime — the bug class this catches), entry() smoke,
then RAW-TUPLE comparison against DuckDB (stricter than parity's
normalized compare: a Decimal-vs-float type divergence fails here).

Usage::

    python tools/driver_sim.py [--sf DIR] [--sample N] [name ...]

With no names, compares a deterministic every-Nth sample of the oracle
registry (default 20 queries) plus entry(); pass names for specific
queries. Exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--sample", type=int, default=20,
                    help="sample size when no names given")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    # deliberately vanilla: no timezone, no nanosAsLong, no AQE — the
    # engine must set what it needs at runtime
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    n_entry = len(e.entry(spark).collect())
    print(f"entry(): {n_entry} rows")

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.names:
        names = args.names
    else:
        ordered = sorted(osql)
        step = max(1, len(ordered) // args.sample)
        names = ordered[::step][: args.sample]

    failed = []
    for name in names:
        if name not in qs:
            print(f"UNKNOWN: {name}")
            failed.append(name)
            continue
        try:
            sp = sorted(map(tuple, qs[name](spark, args.sf).collect()))
            if name in osql:
                du = sorted(map(tuple, con.execute(osql[name]).fetchall()))
                if sp != du:
                    diff = next(
                        (i for i, (a, b) in enumerate(zip(sp, du)) if a != b),
                        min(len(sp), len(du)),
                    )
                    print(f"MISMATCH {name}: rows {len(sp)} vs {len(du)}, "
                          f"first diff at {diff}")
                    failed.append(name)
                else:
                    print(f"[OK raw-exact] {name}: {len(sp)} rows")
            else:
                print(f"[OK rows-only] {name}: {len(sp)} rows")
        except Exception as ex:
            print(f"ERROR {name}: {str(ex)[:120]}")
            failed.append(name)

    print(f"{len(names) - len(failed)}/{len(names)} passed on a vanilla session")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
