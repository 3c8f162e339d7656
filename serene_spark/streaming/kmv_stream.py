"""Streaming KMV distinct-count monitoring — the continuous form of the
batch ``kmv_ndv_users`` sketch (operators/sketches.py), demonstrating the
property the sketch exists FOR: *mergeability under partial views of the
stream with bounded state*.

Why this is correct (the merge lemma the tests pin): an element of the
GLOBAL bottom-K of distinct hashes is, within its own micro-batch, smaller
than at least that batch's K-th minimum — so it survives the per-batch
bottom-K partial. Hence

    bottom_K( union of per-epoch bottom-Ks ) = bottom_K( whole stream )

exactly, and the streamed estimate is BIT-IDENTICAL to the batch sketch of
the same data, not approximately-equal. Re-occurrences across epochs
dedupe at merge time because a key's hash is the same in every batch.

Shape (the matview_stream recipe):

* **write side** — each micro-batch reduces to its per-type bottom-K of
  distinct user-day hashes (at most K rows per type per epoch — the state
  bound a raw COUNT(DISTINCT) monitor cannot give) and lands them in an
  ``epoch=<id>`` partition with dynamic overwrite, idempotent under
  foreachBatch's at-least-once redelivery.
* **read side** — merge the partial log (types x K x epochs, never
  event-cardinality), re-rank, keep the global bottom-K, estimate with
  the SAME (K-1)/u_K formula as the batch operator (spliced from
  operators/sketches.py, so the two cannot desync numerically).

At 100 TB the partial log is the only growing artifact, and it grows by
|types| x K rows per epoch regardless of event volume; compaction = the
read-side merge materialized back as a single epoch — implemented as
``compact_partials`` below (streaming/compaction.py does the swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.sketches import KMV_K, kmv_hash_u


def _batch_bottom_k(df: DataFrame) -> DataFrame:
    """Per-type bottom-K of distinct user-day hashes of one batch."""
    hashed = df.selectExpr("event_type", f"{kmv_hash_u(SPARK)} AS u").distinct()
    w = Window.partitionBy("event_type").orderBy("u")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_K)
        .select("event_type", "u")
    )


def start_kmv_stream(
    spark: SparkSession, events_dir: str, partials_dir: str, checkpoint_dir: str
):
    """Start the availableNow sketch-maintenance sink; returns the query."""
    from serene_spark.streaming.events_stream import read_events_stream

    stream = read_events_stream(spark, events_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        (
            _batch_bottom_k(batch_df)
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
    """Collapse the partial log back to a single epoch of |types| x K
    rows. Readout is bit-identical before/after (merge lemma: the global
    bottom-K IS the union's sketch) and future epochs compose as if the
    originals were still there. Returns #epoch partitions removed."""
    from serene_spark.streaming.compaction import compact_partials as _c

    return _c(spark, partials_dir, value_cols=("u",), k=KMV_K)


def read_kmv(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Current per-type sketch readout from the partial log: merge, dedupe
    (same key -> same hash in every epoch), global bottom-K, and the batch
    operator's estimator verbatim."""
    spark.read.parquet(partials_dir).select("event_type", "u").distinct() \
        .createOrReplaceTempView("__kmv_partials")
    return spark.sql(f"""
WITH sk AS (
  SELECT event_type, u FROM (
    SELECT event_type, u,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rk
    FROM __kmv_partials
  ) r WHERE rk <= {KMV_K}
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS sketch_size,
       round(CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST({KMV_K - 1} AS DOUBLE) / MAX(u) END, 6) AS ndv_est
FROM sk GROUP BY event_type
ORDER BY event_type
""")
