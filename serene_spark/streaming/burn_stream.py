"""Continuous SLO burn-rate monitoring — the streaming twin of the batch
``slo_burn_rate`` operator (operators/governance_ops.py), built on the
matview_stream recipe:

* **write side** — each micro-batch reduces to (hour, n, errs) partial
  counts (map-only + one tiny keyed agg) landed in an ``epoch=<id>``
  partition with dynamic overwrite, so foreachBatch's at-least-once
  redelivery is idempotent (replaying an epoch overwrites its own
  partition, never double-counts).
* **read side** — merge the hour-keyed partial log (hours × epochs rows,
  never event-cardinality) and run the SHARED
  ``governance_ops.burn_fold_sql`` fold — zero-filled spine, 1h/6h
  rolling burns, the joint page condition — one definition, so the
  streamed readout is numerically IDENTICAL to the batch operator over
  the same drained data (pinned in tests/test_burn_stream.py, including
  across a two-part split feed).

At scale: the monitor's state is the hour-keyed partial log — bounded by
calendar hours, not traffic; the stream stage shuffles each micro-batch
to at most |hours-in-batch| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_burn_stream(
    spark: SparkSession, events_dir: str, partials_dir: str, checkpoint_dir: str,
):
    """Start the availableNow burn-monitor sink; returns the query."""
    from serene_spark.streaming.events_stream import read_events_stream

    stream = read_events_stream(spark, events_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.selectExpr(
                # the batch twin's exact hour expression (epoch_s shim)
                "unix_timestamp(ts) div 3600 AS h",
                "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e",
            )
            .groupBy("h")
            .agg(F.count("*").alias("n"), F.sum("e").alias("errs"))
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(partials_dir)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_partials(spark: SparkSession, partials_dir: str) -> int:
    """Fold the hour-keyed partial log back to ONE epoch: counts are
    algebraic, so ``read_burn`` is invariant (merged sums are already
    the sink's bigint types). ADDITIVE sink: requires no concurrent
    reader during the swap (streaming/compaction.py module docstring).
    Returns #epoch partitions removed."""
    from serene_spark.streaming.compaction import _epoch_swap

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .groupBy("h")
            .agg(F.sum("n").alias("n"), F.sum("errs").alias("errs"))
        )

    return _epoch_swap(spark, partials_dir, merged)


def read_burn(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Current burn readout from the partial log via the SHARED fold."""
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.governance_ops import burn_fold_sql

    (
        spark.read.parquet(partials_dir)
        .groupBy("h")
        .agg(F.sum("n").alias("n"), F.sum("errs").alias("errs"))
        .createOrReplaceTempView("__burn_hourly")
    )
    return spark.sql(
        burn_fold_sql(SPARK, "SELECT h, n, errs FROM __burn_hourly")
    )
