"""CSV ingestion with the reference loader's semantics (SURVEY §2.1).

Reference: ``CsvDataLoader`` (matcher/.../ingestion/loader/CsvDataLoader.scala:42-111):
RFC4180 parse, drop all-empty rows (:80-81), multi-line headers joined with
``_``, numeric-header heuristic => headerless (:92-97), and the server-side
``typeMap`` cast (core/.../drivers/DataSetInterface.scala:304-324 ``retypeData``
with LogicalType = {string, integer, float, boolean, factor},
types/.../DataSetTypes.scala:62-83).

Spark-first shape: ``spark.read.csv`` (distributed, PERMISSIVE) does the
parsing; only the header probe reads a bounded prefix. Multi-line headers are
merged by dropping rows that exactly match the probed header rows — a
distributed-safe rephrasing of "skip first N lines" (Spark's CSV source has
no skipLines; an exact-match data row would be dropped too, documented).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NUMERIC_RE = re.compile(r"^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)$")

LOGICAL_TYPES = {
    "string": "string",
    "integer": "long",
    "float": "double",
    "boolean": "boolean",
    "factor": "string",  # factor = string + categorical metadata (DataSetTypes.scala:62-83)
}


def _sanitize(name: str) -> str:
    name = name.strip()
    return re.sub(r"[^0-9a-zA-Z_]+", "_", name) or "col"


def load_csv(
    spark: SparkSession,
    path: str,
    header_lines: int = 1,
    type_map: dict[str, str] | None = None,
) -> DataFrame:
    """Load CSV(s) at ``path`` (file, dir, or glob) with serene semantics."""
    raw = spark.read.csv(path, header=False, inferSchema=False, mode="PERMISSIVE")
    ncols = len(raw.columns)

    header_rows = raw.limit(header_lines).collect() if header_lines > 0 else []
    names: list[str]
    headerless = False
    if header_rows:
        first = ["" if v is None else str(v) for v in header_rows[0]]
        # numeric-header heuristic (CsvDataLoader.scala:92-97): an all-numeric
        # first row is data, not a header
        if all(_NUMERIC_RE.match(v) for v in first if v != ""):
            headerless = True
    if header_lines == 0 or headerless or not header_rows:
        names = [f"col_{i}" for i in range(ncols)]
        df = raw
    else:
        parts: list[list[str]] = [
            ["" if v is None else str(v) for v in row] for row in header_rows
        ]
        names = [
            _sanitize("_".join(p[i] for p in parts if p[i] != "") or f"col_{i}")
            for i in range(ncols)
        ]
        # drop the header rows themselves (exact-match filter; see module doc)
        cond = None
        for p in parts:
            row_match = None
            for i, c in enumerate(raw.columns):
                eq = F.coalesce(F.col(c), F.lit("")) == F.lit(p[i])
                row_match = eq if row_match is None else (row_match & eq)
            cond = row_match if cond is None else (cond | row_match)
        df = raw.filter(~cond)

    # dedupe names
    seen: dict[str, int] = {}
    final = []
    for n in names:
        if n in seen:
            seen[n] += 1
            final.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            final.append(n)
    df = df.toDF(*final)

    # drop all-empty rows (CsvDataLoader.scala:80-81)
    any_filled = None
    for c in final:
        filled = F.length(F.trim(F.coalesce(F.col(c), F.lit("")))) > 0
        any_filled = filled if any_filled is None else (any_filled | filled)
    df = df.filter(any_filled)

    if type_map:
        for col, ltype in type_map.items():
            if col in df.columns:
                spark_type = LOGICAL_TYPES.get(ltype.lower())
                if spark_type is None:
                    raise ValueError(f"unknown logical type {ltype!r} for column {col!r}")
                df = df.withColumn(col, F.col(col).cast(spark_type))
    return df


def sample_columns(df: DataFrame, n: int = 15, seed: int = 1234) -> dict[str, list]:
    """API column sample: n values drawn from the first 4*n rows, seeded
    (DataSetInterface.scala:39-41,214-235)."""
    head = df.limit(4 * n)
    sampled = head.orderBy(F.md5(F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns])), F.lit(seed)).limit(n).collect()
    return {c: [row[c] for row in sampled] for c in df.columns}
