"""Full-registry permutation + file-split invariance sweep.

tests/test_metamorphic_sql.py pins semantics-derived laws for 31 chosen
operators; this tool applies the cheapest and most universal of those
laws — *the result must not depend on input row order or file layout* —
to EVERY oracle-backed query in the registry at once. The registry's own
parity conventions promise exact invariance (float outputs are
round(x,6); sums over doubles go through DECIMAL casts so results are
independent of partial-aggregation order; top-k orders break ties on
ids), so the comparison is parity's EXACT compare, not a tolerance one.

One variant corpus is built with every table permuted (seeded random
order) AND split across multiple parquet files, then each query runs on
the stock corpus and the variant and must produce identical values.

This catches what Spark-vs-DuckDB parity structurally cannot: both
engines share the generated SQL, but neither shares the INPUT LAYOUT —
an operator whose answer depends on arrival order (a window missing its
ORDER BY, a first()/head sneaking into an aggregation, a tie broken by
position) passes parity on the single-file corpus and fails here.

Usage:
    python tools/metamorphic_sweep.py [--sf DIR] [name ...]

Exclusions (documented, order-dependence is their SPEC): none currently —
``ingest_column_sample`` draws its seeded sample from VALUE hashes, not
row positions, so even it must be invariant.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.parity import compare  # noqa: E402


def build_variant(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from serene_spark.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        (df.withColumn("__r", F.rand(1711))
         .repartition(5, "__r")
         .sortWithinPartitions("__r")
         .drop("__r")
         .write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--include-rows-only", action="store_true",
                    help="also sweep queries with no oracle (ML/streaming "
                    "runners may be legitimately nondeterministic)")
    args = ap.parse_args()

    from serene_spark.registry import load_all
    from serene_spark.session import get_spark

    queries = load_all()
    unknown = [n for n in args.names if n not in queries]
    if unknown:  # before the expensive variant build, with a usable hint
        import difflib

        for n in unknown:
            close = difflib.get_close_matches(n, queries, n=3)
            print(f"unknown query {n!r}" + (f" — did you mean {close}?"
                                            if close else ""))
        return 2
    names = args.names or [
        n for n, q in queries.items()
        if q.oracle is not None or args.include_rows_only
    ]

    spark = get_spark("metamorphic-sweep")
    var_dir = tempfile.mkdtemp(prefix="meta_sweep_")
    print(f"building permuted+split variant of {args.sf} -> {var_dir}")
    n_pass = n_fail = 0
    try:
        build_variant(spark, args.sf, var_dir)
        for name in names:
            q = queries[name]
            t0 = time.time()
            try:
                base = q.spark(spark, args.sf).toPandas()
                got = q.spark(spark, var_dir).toPandas()
                problems = compare(name, base, got)
            except Exception:
                problems = [traceback.format_exc(limit=3)]
            sec = time.time() - t0
            if problems:
                n_fail += 1
                print(f"[FAIL] {name}: {problems[0][:300]}")
            else:
                n_pass += 1
                print(f"[OK·invariant] {name}: {len(base)} rows ({sec:.1f}s)")
    finally:
        import shutil

        shutil.rmtree(var_dir, ignore_errors=True)

    print(f"\n{n_pass}/{n_pass + n_fail} invariant under permutation+split")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
