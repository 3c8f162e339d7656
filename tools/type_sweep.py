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

Zero-row escalation (round 10): a query with no output rows at the sweep
SF is not type-checkable there, and silently skipping it is a blind spot
(the round-9 ``runs_test_daily`` DECIMAL bug was exactly the class this
sweep catches).  Such queries are retried at sf0.01 and finally against a
MICRO fixture — the sf0.001 corpus plus engineered rows that give the
always-empty screens output (an exact-duplicate order pair for
``duplicate_payments``; an exact-duplicate embedding for
``dedup_embedding_cosine``), built on demand from copies of real rows so
every dtype matches the driver corpus.  A query empty even on the micro
fixture is still reported as skipped — loudly, so the fixture gets
extended rather than the blind spot silently returning.
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

MICRO_BASE = "/root/testdata/sf0.001"


def _ensure_micro() -> str:
    """Materialize the micro type-check fixture (module docstring):
    the sf0.001 corpus with appended engineered rows, cached in /tmp."""
    import shutil
    import tempfile

    import pandas as pd

    out = os.path.join(tempfile.gettempdir(), "serene_type_sweep_micro")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(MICRO_BASE, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "orders":
            # two copies of a real order under fresh keys: same customer,
            # same exact amount, gap 0 days -> a duplicate-payment pair
            df = pd.read_parquet(src)
            a, b = df.iloc[[0]].copy(), df.iloc[[0]].copy()
            mx = df["o_orderkey"].max()
            a["o_orderkey"] = mx + 1
            b["o_orderkey"] = mx + 2
            pd.concat([df, a, b], ignore_index=True).to_parquet(dst, index=False)
        elif t == "embeddings":
            # an exact copy of a real vector under a fresh id: cosine 1.0
            # in the same sign bucket -> an embedding near-dup pair
            df = pd.read_parquet(src)
            a = df.iloc[[0]].copy()
            a["vec_id"] = df["vec_id"].max() + 1
            pd.concat([df, a], ignore_index=True).to_parquet(dst, index=False)
        else:
            shutil.copy(src, dst)
    with open(done, "w") as f:
        f.write("ok")
    return out


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
    unknown = [n for n in names if n not in osql]
    if unknown:  # an unknown name is an error, not silent "clean" coverage
        for n in unknown:
            print("UNKNOWN QUERY:", n)
        return 1

    def _col_types(cols, rows):
        """First NON-NULL Python type per column over a row sample —
        single-row sampling would compare two engines' arbitrary (and
        possibly different) first rows, where one side's NULL both fakes
        divergences and hides real ones."""
        out = {}
        for i, c in enumerate(cols):
            t = None
            for r in rows:
                if r[i] is not None:
                    t = _ty(r[i])
                    break
            out[c] = t  # None = all-NULL in the sample
        return out

    bad: list[tuple] = []
    tolerated: list[tuple] = []
    skipped: list[str] = []
    duck_dir = args.sf

    def _fetch(name: str, sf_dir: str):
        nonlocal duck_dir
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.limit(50).collect()]
        if sf_dir != duck_dir:
            for t in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
            duck_dir = sf_dir
        cur = con.execute(osql[name])
        return sdf.columns, srows, [d[0] for d in cur.description], cur.fetchmany(50)

    for name in names:
        try:
            escalation = [args.sf, "/root/testdata/sf0.01"]
            scols = srows = ocols = orows = None
            for sf_try in dict.fromkeys(escalation):  # de-duped, ordered
                scols, srows, ocols, orows = _fetch(name, sf_try)
                if srows and orows:
                    break
            else:
                # last resort: the engineered micro fixture
                scols, srows, ocols, orows = _fetch(name, _ensure_micro())
            if not srows or not orows:
                skipped.append(name)  # nothing inspected — NOT clean
                continue
            smap = _col_types(scols, srows)
            omap = _col_types(ocols, orows)
            for c, a in smap.items():
                b = omap.get(c)
                if a is None or b is None or a == b:
                    continue
                if {a, b} in _TOLERATED:
                    tolerated.append((name, c, a, b))
                else:
                    bad.append((name, c, a, b))
        except Exception as ex:  # surface, keep sweeping
            bad.append((name, "<error>", str(ex)[:100], ""))

    for row in bad:
        print("DIVERGENT:", row)
    for row in tolerated:  # visible, non-failing (integer-width presentation)
        print("tolerated:", row)
    if skipped:
        print(f"skipped (no rows at this sf, NOT checked): {skipped}")
    n_clean = len(names) - len({b[0] for b in bad}) - len(skipped)
    print(f"{n_clean}/{len(names)} type-clean, {len(skipped)} skipped")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
