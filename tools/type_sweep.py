"""Output-type parity sweep: raw Python type of every output column,
Spark vs DuckDB, for all oracle-backed queries.

``tools/parity.py`` compares VALUES after normalization, so a column that
comes back ``Decimal`` from one engine and ``float`` from the other still
passes — but the divergence means the engines disagree about the
expression's type (the classic cause: a bare ``1000000.0`` literal parses
as DECIMAL in Spark SQL and DOUBLE in DuckDB), and any consumer that
hashes or serializes raw values sees different bytes.  This sweep found
two such latent cases in round 4 (``_u01``, ``similarity_pq_adc``).

Usage::

    python tools/type_sweep.py [--sf DIR] [name ...]

Exit code 1 if any divergence is found.  int-vs-decimal and int-vs-float
pairs are tolerated (COUNT/SUM integer-width presentation differs benignly
across engines); everything else is reported.
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _ty(v) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return "ts"
    return type(v).__name__


_TOLERATED = ({"int", "decimal"}, {"int", "float"})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from serene_spark.session import get_spark

    spark = get_spark("type-sweep")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or sorted(osql)
    bad: list[tuple] = []
    for name in names:
        if name not in osql:
            continue
        try:
            sdf = qs[name](spark, args.sf)
            srow = sdf.limit(1).collect()
            cur = con.execute(osql[name])
            orow = cur.fetchone()
            if not srow or orow is None:
                continue
            smap = dict(zip(sdf.columns, [_ty(v) for v in srow[0]]))
            omap = dict(zip([d[0] for d in cur.description],
                            [_ty(v) for v in orow]))
            for c, a in smap.items():
                b = omap.get(c)
                if a != b and {a, b} not in _TOLERATED:
                    bad.append((name, c, a, b))
        except Exception as ex:  # surface, keep sweeping
            bad.append((name, "<error>", str(ex)[:100], ""))

    for row in bad:
        print("DIVERGENT:", row)
    print(f"{len(names) - len({b[0] for b in bad})}/{len(names)} type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
