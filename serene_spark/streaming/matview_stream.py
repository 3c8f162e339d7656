"""Streaming materialized-view maintenance — the continuous form of the
batch ``matview_incremental_hourly`` operator (operators/matview.py):
events arrive as files, each micro-batch reduces to hourly per-type PARTIAL
aggregates, and the partials land in a persisted log the read side merges.

Design: the state table is a *partial-aggregate log* partitioned by epoch,
not a mutable aggregate — the two-level shape every streaming-view engine
uses (partials commute and associate, so merge order is free):

* **write side** — one keyed agg per micro-batch (count / decimal sum /
  min / max are all algebraic), written to ``epoch=<id>`` with dynamic
  partition overwrite: a redelivered epoch overwrites exactly its own
  partials, making the write idempotent under foreachBatch's
  at-least-once contract (same recipe as streaming/incremental_dedup).
* **read side** — ``read_matview`` merges the log by group key; identical
  formula to the batch FULL-OUTER merge, proven against the batch
  recompute in tests.  A periodic compaction folding old epochs into one
  keeps the log bounded; the merge result is invariant to compaction
  because the partials are associative.

Scale: each batch costs one event-cardinality agg over the NEW files only;
the log grows with (hours × types × epochs-since-compaction), never with
event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOUR_US = 3600 * 1_000_000


def _partials(batch_df: DataFrame) -> DataFrame:
    """Hourly (hour_bucket, event_type) partials — the same arms as
    operators/matview._partials, by construction (decimal sums so merge
    order is exact)."""
    return (
        batch_df.withColumn(
            "hour_bucket", F.expr(f"unix_micros(ts) DIV {HOUR_US}")
        )
        .withColumn("v", F.col("value").cast("decimal(18,2)"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_value"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
    )


def start_matview_stream(
    spark: SparkSession, events_dir: str, partials_dir: str, checkpoint_dir: str
):
    """Start the availableNow maintenance sink; returns the streaming query.

    The stream comes from events_stream.read_events_stream, which owns the
    schema probe (with the empty-drop-directory fallback) and the ts
    normalization — one ts shim for the whole streaming layer.
    """
    from serene_spark.streaming.events_stream import read_events_stream

    stream = read_events_stream(spark, events_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        (
            _partials(batch_df)
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
    """Fold the partial-aggregate log back to ONE epoch — the compaction
    the module docstring promises. Exact because the partials are
    algebraic (count/decimal-sum/min/max commute and associate), so the
    merged row set IS a valid partial set and ``read_matview`` is
    invariant. The merged columns are cast back to the sink's exact
    write schema — n_events bigint and sum_value decimal(28,2), the
    type the sink's own SUM over decimal(18,2) values writes: without
    the cast, re-summing here widens to (38,2) and the log would mix
    parquet schemas across files. The cast can only overflow past
    10^26 in one (hour, type) cell — beyond any event volume. ADDITIVE
    sink: requires no concurrent reader during the swap
    (streaming/compaction.py module docstring). Returns #epoch
    partitions removed."""
    from serene_spark.streaming.compaction import _epoch_swap

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .groupBy("hour_bucket", "event_type")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("sum_value").cast("decimal(28,2)").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )

    return _epoch_swap(spark, partials_dir, merged)


def read_matview(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge the partial-aggregate log into the current view — the same
    output schema as the batch operator's merged view."""
    p = spark.read.parquet(partials_dir)
    merged = p.groupBy("hour_bucket", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return merged.select(
        F.col("hour_bucket").cast("bigint"),
        "event_type",
        F.col("n_events").cast("bigint"),
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        F.round(F.col("min_value").cast("double"), 6).alias("min_value"),
        F.round(F.col("max_value").cast("double"), 6).alias("max_value"),
        F.round(
            F.col("sum_value").cast("double") / F.col("n_events"), 6
        ).alias("avg_value"),
    )


def read_anomalies(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Continuous monitoring over the streamed view: the rate-anomaly
    z-scores (operators/sequence.anomalies_sql semantics, same RANGE
    baseline and integer-exact variance) computed from the partial-
    aggregate log's hourly counts instead of rescanning raw events — the
    streaming twin of ``events_hourly_anomalies``.  Cost per refresh is
    the merged-view cardinality (hours × types), never event cardinality.
    """
    from serene_spark.operators.sequence import TRAIL, Z_THRESHOLD

    read_matview(spark, partials_dir).select(
        "event_type", "hour_bucket", F.col("n_events").alias("cnt")
    ).createOrReplaceTempView("__mv_hourly")
    out = spark.sql(f"""
WITH win AS (
  SELECT event_type, hour_bucket, cnt,
         SUM(cnt) OVER w AS s1,
         SUM(cnt * cnt) OVER w AS s2,
         COUNT(*) OVER w AS n
  FROM __mv_hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
               RANGE BETWEEN {TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       CAST(hour_bucket AS BIGINT) AS hour_bucket,
       CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS baseline_mean,
       ROUND((cnt - CAST(s1 AS DOUBLE) / n)
             / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                    / (n - 1)), 6) AS z_score,
       CASE WHEN abs((cnt - CAST(s1 AS DOUBLE) / n)
                     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                            / (n - 1))) >= {Z_THRESHOLD}
            THEN 1 ELSE 0 END AS is_anomaly
FROM win
WHERE n >= 12
  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) > 0
""")
    return out
