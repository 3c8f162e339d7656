"""Streaming drift monitoring — the continuous form of the batch
``drift_psi_events`` operator (operators/drift.py), with the PRODUCTION
edge convention: bin edges are FROZEN from the reference (training)
window and never move with arriving data.

Contract difference vs the batch query, stated up front: the batch
``drift_psi_events`` spans each type's GLOBAL [min, max] across both
sides (both sides share binning derived from all data — fine for a
two-window retrospective).  A monitor cannot do that: the current window
is unbounded and still arriving, so edges must be fixed at deployment
time from the reference window alone — exactly how PSI is run against a
model in production.  Out-of-range arrivals clamp into the edge bins
(GREATEST/LEAST), so novel mass beyond the training range lands in bin 0
or bin N-1 and *raises* PSI, as it should.  ``frozen_edge_psi_batch``
is the batch twin under the SAME convention; the stream is pinned equal
to it in tests.

Shape (the matview_stream recipe):

* **reference side** — one batch pass over the training window builds the
  per-type edges + smoothed bin histogram, persisted once (the
  model-registry artifact a monitor ships with).
* **write side** — each micro-batch joins the BROADCAST edges (types × 2
  values, metadata-sized), bins per-row (map-only), reduces to
  (type, bin) partial counts, and lands them in an ``epoch=<id>``
  partition with dynamic overwrite — idempotent under foreachBatch's
  at-least-once redelivery.
* **read side** — merge the partial log (types × bins × epochs, never
  event-cardinality), LEFT-JOIN onto the full reference spine, and fold
  the 9-dp-rounded decimal PSI terms — the identical term formula as the
  batch operator, so the two cannot desync numerically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.operators.drift import PSI_BINS, PSI_THRESHOLD
from serene_spark.operators.matview import SPLIT_TS

_V = "CAST(value AS DECIMAL(18,2))"


def _bin_expr(lo: str, hi: str, v: str) -> str:
    """Frozen-edge bin id with out-of-range clamping to the edge bins."""
    width = f"(({hi} - {lo} + 0.01) / {PSI_BINS})"
    raw = f"CAST(FLOOR(({v} - {lo}) / {width}) AS INT)"
    return f"GREATEST(0, LEAST({PSI_BINS} - 1, {raw}))"


def build_reference(spark: SparkSession, events: DataFrame, ref_dir: str) -> None:
    """One pass over the reference (training) window: per-type frozen
    edges + bin counts, persisted as the monitor's deployment artifact."""
    ref = events.filter(f"ts < TIMESTAMP '{SPLIT_TS}' AND value IS NOT NULL")
    edges = (
        ref.selectExpr("event_type", f"{_V} AS v")
        .groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("na"))
    )
    binned = (
        ref.selectExpr("event_type", f"{_V} AS v")
        .join(F.broadcast(edges), "event_type")
        .selectExpr("event_type", _bin_expr("lo", "hi", "v") + " AS bin_id")
        .groupBy("event_type", "bin_id")
        .agg(F.count("*").alias("ca"))
    )
    spine = edges.selectExpr(
        "event_type", "lo", "hi", "na",
        f"explode(sequence(0, {PSI_BINS} - 1)) AS bin_id",
    )
    (
        spine.join(binned, ["event_type", "bin_id"], "left")
        .withColumn("ca", F.coalesce("ca", F.lit(0)))
        .write.mode("overwrite")
        .parquet(ref_dir)
    )


def start_drift_stream(
    spark: SparkSession, events_dir: str, ref_dir: str, partials_dir: str,
    checkpoint_dir: str,
):
    """Start the availableNow monitoring sink; returns the streaming query."""
    from serene_spark.streaming.events_stream import read_events_stream

    stream = read_events_stream(spark, events_dir)
    edges = spark.read.parquet(ref_dir).select("event_type", "lo", "hi").distinct()

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        cur = batch_df.filter(
            f"ts >= TIMESTAMP '{SPLIT_TS}' AND value IS NOT NULL"
        ).selectExpr("event_type", f"{_V} AS v")
        (
            cur.join(F.broadcast(edges), "event_type")
            .selectExpr("event_type", _bin_expr("lo", "hi", "v") + " AS bin_id")
            .groupBy("event_type", "bin_id")
            .agg(F.count("*").alias("cb"))
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


def _psi_from_counts(spark: SparkSession) -> DataFrame:
    """Shared read-side fold: expects temp views __ref (event_type, bin_id,
    lo, hi, na, ca) and __cur (event_type, bin_id, cb)."""
    return spark.sql(f"""
WITH nb_tot AS (
  SELECT r.event_type, SUM(COALESCE(c.cb, 0)) AS nb
  FROM __ref r LEFT JOIN __cur c
    ON r.event_type = c.event_type AND r.bin_id = c.bin_id
  GROUP BY r.event_type
),
terms AS (
  SELECT r.event_type, t.nb, r.na,
         CAST(ROUND(
           ((r.ca + 0.5) / (r.na + {PSI_BINS} * 0.5)
            - (COALESCE(c.cb, 0) + 0.5) / (t.nb + {PSI_BINS} * 0.5))
           * LN(((r.ca + 0.5) / (r.na + {PSI_BINS} * 0.5))
                / ((COALESCE(c.cb, 0) + 0.5) / (t.nb + {PSI_BINS} * 0.5))), 9)
         AS DECIMAL(18,9)) AS term
  FROM __ref r
  JOIN nb_tot t ON r.event_type = t.event_type
  LEFT JOIN __cur c ON r.event_type = c.event_type AND r.bin_id = c.bin_id
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_ref,
       CAST(nb AS BIGINT) AS n_cur,
       CAST(ROUND(SUM(term), 6) AS DOUBLE) AS psi,
       CASE WHEN SUM(term) >= {PSI_THRESHOLD} THEN 1 ELSE 0 END AS drifted
FROM terms
GROUP BY event_type, na, nb
""")


def compact_partials(spark: SparkSession, partials_dir: str) -> int:
    """Fold the (type, bin) partial-count log back to ONE epoch: bin
    counts are algebraic, so ``read_drift`` is invariant. ADDITIVE
    sink: requires no concurrent reader during the swap
    (streaming/compaction.py module docstring). Returns #epoch
    partitions removed."""
    from serene_spark.streaming.compaction import _epoch_swap

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .groupBy("event_type", "bin_id")
            .agg(F.sum("cb").alias("cb"))
        )

    return _epoch_swap(spark, partials_dir, merged)


def read_drift(spark: SparkSession, ref_dir: str, partials_dir: str) -> DataFrame:
    """Current PSI per type from the partial log + frozen reference."""
    spark.read.parquet(ref_dir).createOrReplaceTempView("__ref")
    (
        spark.read.parquet(partials_dir)
        .groupBy("event_type", "bin_id")
        .agg(F.sum("cb").alias("cb"))
        .createOrReplaceTempView("__cur")
    )
    return _psi_from_counts(spark)


def frozen_edge_psi_batch(spark: SparkSession, events: DataFrame) -> DataFrame:
    """The batch twin: same frozen-edge semantics over a static table —
    what the stream must equal after draining the same data."""
    ref = events.filter(f"ts < TIMESTAMP '{SPLIT_TS}' AND value IS NOT NULL")
    edges = (
        ref.selectExpr("event_type", f"{_V} AS v")
        .groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("na"))
    )
    ref_binned = (
        ref.selectExpr("event_type", f"{_V} AS v")
        .join(F.broadcast(edges), "event_type")
        .selectExpr("event_type", _bin_expr("lo", "hi", "v") + " AS bin_id")
        .groupBy("event_type", "bin_id")
        .agg(F.count("*").alias("ca"))
    )
    spine = edges.selectExpr(
        "event_type", "lo", "hi", "na",
        f"explode(sequence(0, {PSI_BINS} - 1)) AS bin_id",
    )
    spine.join(ref_binned, ["event_type", "bin_id"], "left").withColumn(
        "ca", F.coalesce("ca", F.lit(0))
    ).createOrReplaceTempView("__ref")
    (
        events.filter(f"ts >= TIMESTAMP '{SPLIT_TS}' AND value IS NOT NULL")
        .selectExpr("event_type", f"{_V} AS v")
        .join(F.broadcast(edges), "event_type")
        .selectExpr("event_type", _bin_expr("lo", "hi", "v") + " AS bin_id")
        .groupBy("event_type", "bin_id")
        .agg(F.count("*").alias("cb"))
        .createOrReplaceTempView("__cur")
    )
    return _psi_from_counts(spark)
