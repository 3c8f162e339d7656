"""The fused feature-matrix statement must be value-identical to the
four standalone profiling statements joined on column_name — checked on
DuckDB over the customer melt (milliseconds; the Spark side runs the same
dialect-shimmed SQL and is covered by the ML-pipeline tests)."""

from __future__ import annotations

import pandas as pd

from serene_spark.catalog import COLUMNS
from serene_spark.functions.melt import melt_sql
from serene_spark.functions.sqlgen import DUCKDB
from serene_spark.operators.profile_chardist import char_entropy_sql
from serene_spark.operators.profile_fused import fused_profile_sql
from serene_spark.operators.profile_scalar import hist_sql, profile_scalar_sql
from serene_spark.operators.profile_textstats import numeric_stats_sql, textlen_stats_sql


def _fused(duck, table: str) -> pd.DataFrame:
    long_rel = f"({melt_sql(table, COLUMNS[table])})"
    duck.execute(
        f"CREATE OR REPLACE TEMP VIEW __hist AS SELECT * FROM ({hist_sql(long_rel)}) h"
    )
    return duck.execute(fused_profile_sql("__hist", DUCKDB)).fetchdf()


def _four_way(duck, table: str) -> pd.DataFrame:
    long_rel = f"({melt_sql(table, COLUMNS[table])})"
    out = duck.execute(profile_scalar_sql(long_rel, DUCKDB)).fetchdf()
    tl = duck.execute(textlen_stats_sql(long_rel, DUCKDB)).fetchdf()[
        ["column_name", "mean_len", "median_len", "mode_len", "min_len", "max_len"]
    ]
    ce = duck.execute(char_entropy_sql(long_rel, DUCKDB)).fetchdf()[
        ["column_name", "shannon_char_entropy"]
    ]
    nm = duck.execute(numeric_stats_sql(long_rel, DUCKDB)).fetchdf()[
        ["column_name", "mean_num", "median_num", "min_num", "max_num"]
    ]
    for extra in (tl, ce, nm):
        out = out.merge(extra, on="column_name", how="left")
    return out


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values("column_name").reset_index(drop=True)
    return df.astype({c: float for c in df.columns if c != "column_name"})


def test_fused_equals_four_way_customer(duck):
    a, b = _norm(_fused(duck, "customer")), _norm(_four_way(duck, "customer"))
    pd.testing.assert_frame_equal(a, b)


def test_fused_equals_four_way_orders(duck):
    a, b = _norm(_fused(duck, "orders")), _norm(_four_way(duck, "orders"))
    pd.testing.assert_frame_equal(a, b)


def test_fused_gating_drops_families(duck):
    long_rel = f"({melt_sql('customer', COLUMNS['customer'])})"
    duck.execute(
        f"CREATE OR REPLACE TEMP VIEW __hist AS SELECT * FROM ({hist_sql(long_rel)}) h"
    )
    slim = duck.execute(
        fused_profile_sql("__hist", DUCKDB, needs_textlen=False,
                          needs_char_entropy=False, needs_numeric=True)
    ).fetchdf()
    assert "mean_len" not in slim.columns
    assert "shannon_char_entropy" not in slim.columns
    assert "mean_num" in slim.columns
