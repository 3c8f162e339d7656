"""Capture .explain('formatted') for bench queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/explain_bench.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name tail)
  queries: default = the 13 bench headliners.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402

TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r12")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)

    from serene_spark.registry import load_all
    from serene_spark.session import get_spark

    queries = load_all()
    if "profile_scalar_lineitem" not in queries:
        from serene_spark.operators.profile_scalar import profile_scalar
        from serene_spark.registry import Query

        queries["profile_scalar_lineitem"] = Query(
            "profile_scalar_lineitem",
            lambda spark, sf: profile_scalar(spark, sf, "lineitem"),
            None,
        )

    spark = get_spark("serene-explain")
    for name in names:
        df = queries[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
