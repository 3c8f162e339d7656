"""Streaming quantile-sketch maintenance — the continuous form of the
batch ``quantile_sketch_bottomk`` (operators/sketches.py), built on the
same merge lemma as streaming/kmv_stream.py: a member of the GLOBAL
bottom-K row-hash sample is, within its own micro-batch, below that
batch's K-th minimum, so it survives the per-batch bottom-K partial and

    bottom_K( union of per-epoch bottom-Ks ) = bottom_K( whole stream )

EXACTLY. Because the retained unit is a (hash, value) ROW — not a
distinct key — re-delivery of the same rows dedupes at merge time on the
(event_type, u, v) triple (a row's hash and value are the same in every
replay), and the streamed p50/p90/p99 readout is BIT-IDENTICAL to the
batch sketch of the same events.

Shape (the kmv_stream recipe verbatim):

* **write side** — each micro-batch reduces to its per-type bottom-K of
  row hashes (<= K rows per type per epoch) landed in an ``epoch=<id>``
  partition with dynamic overwrite — idempotent under foreachBatch's
  at-least-once redelivery;
* **read side** — merge the partial log (types x K x epochs rows, never
  event-cardinality), re-rank, keep the global bottom-K, read the
  count-based quantiles off it with the batch operator's convention
  (spliced from operators/sketches.py so the two cannot desync).

At 100 TB the partial log grows by |types| x K rows per epoch regardless
of event volume; compaction = the read-side merge materialized back as
a single epoch — implemented as ``compact_partials`` below
(streaming/compaction.py does the swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.sketches import QSK_K, qsketch_hash_u


def _batch_bottom_k(df: DataFrame) -> DataFrame:
    """Per-type bottom-K (row hash, value) sample of one micro-batch."""
    hashed = df.where("value IS NOT NULL").selectExpr(
        "event_type",
        f"{qsketch_hash_u(SPARK)} AS u",
        "CAST(value AS DECIMAL(18,2)) AS v",
    )
    w = Window.partitionBy("event_type").orderBy("u")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= QSK_K)
        .select("event_type", "u", "v")
    )


def start_quantile_stream(
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
    (hash, value) rows. Readout is bit-identical before/after (the
    retained unit is the row sample the read side would keep anyway) and
    future epochs compose unchanged. Returns #epoch partitions removed."""
    from serene_spark.streaming.compaction import compact_partials as _c

    return _c(spark, partials_dir, value_cols=("u", "v"), k=QSK_K)


def read_quantiles(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Current per-type quantile readout from the partial log: merge,
    dedupe (same row -> same (u, v) in every epoch), global bottom-K,
    then the batch operator's count-based quantile convention."""
    spark.read.parquet(partials_dir).select("event_type", "u", "v") \
        .distinct().createOrReplaceTempView("__qsk_partials")
    return spark.sql(f"""
WITH sample AS (
  SELECT event_type, v FROM (
    SELECT event_type, v,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rk
    FROM __qsk_partials
  ) r WHERE rk <= {QSK_K}
),
scount AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM sample GROUP BY event_type, v
),
scum AS (
  SELECT event_type, v,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cc,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM scount
)
SELECT event_type, CAST(n AS BIGINT) AS sample_n,
       CAST(MIN(CASE WHEN cc >= ceil(0.50 * n) THEN v END) AS DOUBLE) AS p50_est,
       CAST(MIN(CASE WHEN cc >= ceil(0.90 * n) THEN v END) AS DOUBLE) AS p90_est,
       CAST(MIN(CASE WHEN cc >= ceil(0.99 * n) THEN v END) AS DOUBLE) AS p99_est
FROM scum GROUP BY event_type, n
ORDER BY event_type
""")
