"""Data-layout primitives for 100 TB operation: bucketing, partitioned
writes, and skew salting.

These are the storage/shuffle knobs a production deployment of this engine
turns, packaged as first-class utilities with plan-audit tests
(tests/test_layout.py):

- **Bucketed tables** — pre-shuffle a fact table once on its join key so
  every subsequent join/aggregation on that key is exchange-free. At 100 TB
  the one-time bucketed write amortizes across every downstream query of the
  key (the classic lineitem⋈orders co-location).
- **Date-partitioned writes** — directory-level partition pruning: a filter
  on the partition column prunes whole files at planning time (the scan's
  ``PartitionFilters``), so a one-day query over years of events reads one
  directory.
- **Salted two-phase aggregation** — when a groupBy key is skewed (one hot
  key owns most rows), a single shuffle sends the hot key to one reducer.
  Salting splits each key into ``n_salt`` sub-keys for a partial aggregate,
  then re-aggregates the tiny partial relation — two shuffles, but the first
  has ``n_salt``-way parallelism per hot key and the second moves only
  (keys x n_salt) pre-combined rows. AQE's skew-join handling covers joins;
  this covers aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    A join or aggregation on ``bucket_cols`` between two tables bucketed the
    same way plans with NO Exchange on either side (and with ``sort=True``,
    no Sort either — the sort-merge join reads pre-sorted buckets).
    ``path`` makes it an external table (the warehouse dir is a static conf,
    so tests and ad-hoc sessions pass an explicit location).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", partition_col: str = "event_date"
) -> None:
    """Write ``df`` parquet partitioned by the date of ``ts_col``.

    Queries filtering on ``partition_col`` prune directories at planning
    time; the original timestamp column is preserved for row-level
    predicates.
    """
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe two-phase aggregation.

    ``aggs`` maps output column name -> one of ``sum``/``count``/``min``/
    ``max`` over an input column (``count`` takes any column; these are the
    algebraic aggregates a two-phase plan can split). Phase 1 groups by
    (keys + row-position salt) with map-side combine as usual; phase 2
    merges the ``n_salt`` partials per key: sum->sum, count->sum, min->min,
    max->max. Result matches ``df.groupBy(keys).agg(...)`` exactly for
    integer/decimal inputs and for count/min/max at any salt width;
    floating-point sums agree only up to reassociation error (the two-phase
    plan changes addition order) — the tests compare float sums rounded.
    """
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    parsed = {out: spec.split(":", 1) for out, spec in aggs.items()}  # out -> [fn, col]

    # row-position salt, NOT a row-content hash: exact-duplicate rows are a
    # primary cause of key skew, and a content hash would send them all to
    # one salt bucket. monotonically_increasing_id varies between task
    # retries, but any salt assignment merges to the same final aggregate
    # (the merge is over an arbitrary partition of the rows), so the result
    # is still deterministic.
    salt_col = "__serene_salt"
    partial = (
        df.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)))
        .groupBy(*keys, salt_col)
        .agg(*[phase1_fn[fn](F.col(col)).alias(out) for out, (fn, col) in parsed.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](F.col(out)).alias(out) for out, (fn, _) in parsed.items()]
    )
