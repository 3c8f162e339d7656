"""Fused feature-matrix profiler: all four profiling families from ONE
(column, value) histogram.

The classifier's feature matrix needs scalar features + text-length stats +
char entropy + numeric stats for every column (ml/pipeline.py).  Run as four
separate statements they cost four scans / four shuffles of the long
relation; but each family is already a count-weighted sum over the same
(column, value) histogram (profile_scalar.hist_sql), so this module emits a
single statement over a pre-materialized histogram:

    long relation  --one scan, one shuffle-->  hist  --tiny aggs-->  matrix

The histogram is the ONLY data-scale relation; everything downstream is
sized by distinct values per column.  The Spark runner materializes hist
once (localCheckpoint — Spark inlines CTEs, so a hist CTE referenced by six
consumers would recompute) and the derived aggregations read it from
executor memory.

The registered single-family queries (profile_scalar_*, textlen_stats_*,
numeric_stats_*, char_entropy_*) keep their standalone SQL — this module is
the ML-path composition; its DuckDB equivalence to the four-way join of the
standalone statements is pinned in tests/test_profile_fused.py.
"""

from __future__ import annotations

from serene_spark.functions.sqlgen import DUCKDB, rx
from serene_spark.operators.profile_scalar import scalar_body
from serene_spark.operators.profile_textstats import (
    NUM_PAT,
    numeric_body,
    numeric_onepass_body,
    textlen_body,
    textlen_onepass_body,
)


def ncounts_from_hist_sql(hist_rel: str, dialect: str) -> str:
    """(column, numeric value) -> count derived from the histogram —
    SUM(cnt) per parsed numeric is identical to counting raw rows
    (num_counts_sql); the NUM_PAT regex runs once per DISTINCT value."""
    num = "CAST(trim(value) AS DECIMAL(28,10))"
    return f"""
  SELECT column_name, {num} AS num, CAST(SUM(cnt) AS BIGINT) AS c
  FROM {hist_rel}
  WHERE {rx(dialect, 'trim(value)', NUM_PAT)}
  GROUP BY column_name, {num}
"""


def fused_profile_sql(
    hist_rel: str,
    dialect: str,
    needs_textlen: bool = True,
    needs_char_entropy: bool = True,
    needs_numeric: bool = True,
    ncounts_src: str | None = None,
) -> str:
    """One statement over ``hist_rel`` (column_name, value, cnt, ne) joining
    every gated feature family on column_name (LEFT joins: a column with no
    numeric values simply has NULL numeric stats — the caller's -1 coalesce
    applies the reference sentinel)."""
    # Spark side runs the one-pass physical forms (single fused aggregation /
    # array-fold median — see scalar_onepass_sql, textlen_onepass_body): same
    # values, far fewer exchanges/joins in the already-join-heavy fused
    # statement. DuckDB keeps the dialect-shared three-CTE forms.
    if dialect == DUCKDB:
        ctes = [f"scalar_out AS (WITH {scalar_body(dialect, hist_rel)})"]
    else:
        from serene_spark.operators.profile_scalar import scalar_onepass_sql

        ctes = [f"scalar_out AS (WITH {scalar_onepass_sql(dialect, hist_rel)})"]
    cols = ["s.*"]
    joins = []

    if needs_textlen:
        # (column, len) -> count derived from the histogram: SUM(cnt) per
        # length is identical to counting raw rows (len_counts_sql)
        ctes.append(f"""lcounts AS (
  SELECT column_name, CAST(length(value) AS BIGINT) AS len,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM {hist_rel} GROUP BY column_name, length(value)
)""")
        if dialect == DUCKDB:
            ctes.append(f"tl_out AS (WITH {textlen_body('lcounts', 'tl_')})")
        else:
            ctes.append(f"tl_out AS ({textlen_onepass_body('lcounts')})")
        cols += ["t.mean_len", "t.median_len", "t.mode_len", "t.min_len", "t.max_len"]
        joins.append("LEFT JOIN tl_out t ON s.column_name = t.column_name")

    if needs_char_entropy:
        # char explode over DISTINCT values only, weighted by cnt
        # (profile_chardist._chars_rel semantics; ne=1 = its NONEMPTY filter)
        if dialect == DUCKDB:
            ch = "unnest(string_split(value, ''))"
        else:
            ch = "explode(split(value, ''))"
        ctes.append(f"""chars AS (
  SELECT column_name, {ch} AS ch, cnt AS vcnt FROM {hist_rel} WHERE ne = 1
)""")
        ctes.append("""ccounts AS (
  SELECT column_name, ch, CAST(SUM(vcnt) AS BIGINT) AS cnt
  FROM chars WHERE length(ch) > 0 GROUP BY column_name, ch
)""")
        # normalized Shannon entropy via the order-insensitive identity
        # (profile_chardist.char_entropy_sql)
        ctes.append("""ce_out AS (
  SELECT column_name,
         round(
           (log2(CAST(SUM(cnt) AS DOUBLE))
            - SUM(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE))) / SUM(cnt)
           ) / log2(98.0), 6) AS shannon_char_entropy
  FROM ccounts GROUP BY column_name
)""")
        cols.append("e.shannon_char_entropy")
        joins.append("LEFT JOIN ce_out e ON s.column_name = e.column_name")

    if needs_numeric:
        # the numeric-detection regex runs once per DISTINCT value.
        # ``ncounts_src``: the Spark runner pre-materializes the ncounts
        # relation (its three consumers — per-column stats, bucket totals,
        # in-bucket pass — would each re-run the regex scan of hist when the
        # CTE is inlined) and passes its view name; the one-statement DuckDB
        # form keeps the inline CTE (DuckDB materializes multi-consumer CTEs
        # itself).
        if ncounts_src is None:
            ctes.append(f"ncounts AS ({ncounts_from_hist_sql(hist_rel, dialect)})")
            nrel = "ncounts"
        else:
            nrel = ncounts_src
        if dialect == DUCKDB:
            ctes.append(f"nm_out AS (WITH {numeric_body(nrel, 'nm_')})")
        else:
            ctes.append(f"nm_out AS (WITH {numeric_onepass_body(nrel, 'nm_')})")
        cols += ["n.mean_num", "n.median_num", "n.min_num", "n.max_num"]
        joins.append("LEFT JOIN nm_out n ON s.column_name = n.column_name")

    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT "
        + ", ".join(cols)
        + "\nFROM scalar_out s\n"
        + "\n".join(joins)
    )
