"""Wide -> long reshaping ("melt").

The reference's fundamental unit is an ``Attribute`` — one column with all of
its values materialized as ``List[String]`` in driver memory
(matcher/.../data/DataModel.scala:89-111). The Spark-native equivalent keeps
column-wise *semantics* with row-wise *representation*: a long-format
DataFrame ``(column_name, value)`` built with ``stack``, so a single shuffled
aggregation profiles every column at once and columns larger than one
machine's memory stay distributed.

Missing values: the reference treats ``trim(value) == ""`` as missing and
maps nulls to "" (FeatureExtractor.scala:98-101); ``melt`` does the same with
``coalesce(cast(col as string), '')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Return ``(column_name: string, value: string)`` for the given columns.

    Uses one ``stack`` projection — narrow, no shuffle; Catalyst prunes the
    scan to exactly the melted columns.
    """
    cols = columns or df.columns
    pairs = ", ".join(f"'{c}', coalesce(cast(`{c}` as string), '')" for c in cols)
    return df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (column_name, value)")
    )


def melt_sql(table: str, columns: tuple[str, ...], value_exprs: dict[str, str] | None = None) -> str:
    """DuckDB-side equivalent of :func:`melt` as a UNION ALL subquery.

    ``value_exprs`` overrides the raw column reference per column (used e.g.
    to render nano timestamps identically on both sides).
    """
    value_exprs = value_exprs or {}
    parts = [
        f"SELECT '{c}' AS column_name, "
        f"coalesce(CAST({value_exprs.get(c, c)} AS VARCHAR), '') AS value FROM {table}"
        for c in columns
    ]
    return "(" + " UNION ALL ".join(parts) + ")"
