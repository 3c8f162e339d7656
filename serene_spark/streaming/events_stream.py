"""Structured Streaming forms of the event operators.

The reference has no streaming surface (SURVEY §2.12); these are the scale
extensions' streaming path: the same tumbling-window aggregation that is
oracle-checked in batch (serene_spark/operators/events.py) expressed as
readStream -> withWatermark -> window agg, plus a file-source factory so any
parquet drop-directory becomes an event stream.

Late data: the watermark bounds state; in append mode a window closes once
the watermark passes its end. The batch/streaming results are asserted equal
in tests via an availableNow run into a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.session import tune_session

EVENTS_DDL = "event_id long, ts long, user_id long, event_type string, value double, props string"


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    The corpus stores TIMESTAMP(NANOS) (read as int64 via nanosAsLong, same
    as the batch path in serene_spark.catalog.load_table).
    """
    tune_session(spark)
    raw = spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `events_tumbling_hour` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain all currently-available input into a memory sink; returns the
    started query (caller awaits termination and reads table ``query_name``)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
