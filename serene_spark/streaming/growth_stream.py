"""Streaming growth accounting — the continuous twin of the batch
``users_new_vs_returning`` query (operators/experiments.py): events land
in a drop directory, and each micro-batch appends the NEW (user, day)
activity pairs to a persistent index, marking each user's first-ever day.
Daily new/returning counts are then a read-side aggregation of the index.

Why an index and not a stateful aggregation: "returning" is a property of
a user's ENTIRE history, so a windowed state store would have to keep
every user forever anyway — the persisted (user, day, is_first) relation
IS that state, stored where a lakehouse stores it (and bucketed by
user_id at cluster scale so the per-batch anti-join is exchange-free —
the plan property pinned in tests/test_layout.py for the fp index,
identical join shape). ``compact_index`` below keeps the partition
count bounded.

Exactly-once: same recipe as incremental_dedup — every epoch writes only
its own ``epoch=<id>`` partition with dynamic overwrite, so foreachBatch
redelivery overwrites rather than duplicates, and the epoch's own prior
output is excluded from the "seen" side of the anti-join.

Ordering contract: first-day attribution is exact when a user's earliest
event is not delivered in a LATER epoch than some other event of theirs
(within-epoch disorder is fine — the batch takes MIN(day)).  The batch
feed (file drops in event-time order) satisfies this; with out-of-order
sources the index would need a retraction pass, which is exactly the
signed-delta device of ``matview_retractable_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.streaming.events_stream import read_events_stream


def start_new_vs_returning(
    spark: SparkSession, events_dir: str, index_dir: str, checkpoint_dir: str
):
    """Start the availableNow growth sink; returns the streaming query.

    The persisted index at ``index_dir`` has schema
    (user_id long, day long, is_first int, epoch long) partitioned by epoch.
    """
    stream = read_events_stream(spark, events_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark_ = batch_df.sparkSession
        user_days = (
            batch_df.select(
                "user_id",
                (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
            )
            .groupBy("user_id", "day")
            .count()
            .drop("count")
        )
        from pyspark.errors import AnalysisException

        try:
            prior = (
                spark_.read.parquet(index_dir)
                .filter(F.col("epoch") != epoch_id)
                .select("user_id", "day")
            )
        except AnalysisException:  # first epoch: no index yet
            prior = None
        if prior is None:
            fresh = user_days
            known_users = None
        else:
            fresh = user_days.join(prior, ["user_id", "day"], "left_anti")
            known_users = prior.select("user_id").distinct()
        # first-ever day: the user is unseen in the index AND this is the
        # earliest of their fresh days in this batch
        min_day = fresh.groupBy("user_id").agg(F.min("day").alias("min_day"))
        marked = fresh.join(min_day, "user_id")
        if known_users is not None:
            marked = marked.join(
                known_users.withColumn("known", F.lit(1)), "user_id", "left"
            )
        else:
            marked = marked.withColumn("known", F.lit(None).cast("int"))
        out = marked.select(
            "user_id",
            "day",
            F.when(
                F.col("known").isNull() & (F.col("day") == F.col("min_day")), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("is_first"),
        )
        (
            out.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(index_dir)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_index(spark: SparkSession, index_dir: str) -> int:
    """Collapse the (user, day, is_first) index's epoch partitions into
    one, preserving the exact row set (epochs are disjoint on
    (user_id, day) by the sink's anti-join; a defensive MAX(is_first)
    guards the invariant), so the per-batch anti-join stops paying one
    file listing per historical micro-batch. Returns #epochs removed."""
    from serene_spark.streaming.compaction import _epoch_swap

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .groupBy("user_id", "day")
            .agg(F.max("is_first").cast("int").alias("is_first"))
        )

    return _epoch_swap(spark, index_dir, merged)


def read_new_vs_returning(spark: SparkSession, index_dir: str) -> DataFrame:
    """Read-side daily rollup of the activity index — same schema as the
    batch ``users_new_vs_returning`` query."""
    idx = spark.read.parquet(index_dir)
    return (
        idx.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("active_users"),
            F.sum("is_first").cast("long").alias("new_users"),
            (F.count("*") - F.sum("is_first")).cast("long").alias("returning_users"),
        )
        .select(
            F.col("day").cast("long").alias("day_bucket"),
            "active_users",
            "new_users",
            "returning_users",
        )
        .orderBy("day_bucket")
    )
