"""Streaming incremental dedup sink — the continuous form of the batch
``snapshot_delta_dedup`` operator (operators/curation.py): documents arrive
as files in a drop directory, and each micro-batch keeps only texts whose
normalized fingerprint has never been seen, appending the survivors to a
persistent fingerprint index.

This is the re-crawl economics shape run CONTINUOUSLY: the index (fp,
doc_id, epoch) is the only state, the raw corpus is never rescanned, and
each batch costs one anti-join against the index.

Exactly-once contract: foreachBatch delivers each epoch at-least-once, so a
naive append would duplicate survivors on redelivery. The sink writes each
epoch to its own ``epoch=<id>`` partition with dynamic partition overwrite —
replaying an epoch overwrites its own output and nothing else, making the
write idempotent (the standard foreachBatch idempotency recipe). Within a
batch, duplicates dedup to the lowest doc_id; across batches, the index
anti-join drops anything already persisted.

Scale: the index is read as a plain parquet relation keyed by fp — on a
cluster it would be bucketed by fp (sources/layout.write_bucketed) so the
per-batch anti-join is exchange-free on the index side; that plan
property is PINNED in tests/test_layout.py (one Exchange total, on the
batch subtree only). ``compact_index`` below keeps the partition count
bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from serene_spark.functions.sqlgen import SPARK as SPARK_DIALECT
from serene_spark.session import tune_session

def _fp_expr() -> str:
    """The batch operator's fingerprint, BY CONSTRUCTION: md5 over the same
    NORM(SPARK) normalization snapshot_delta_dedup uses (curation.py) — a
    change to NORM changes both sides together, so batch and streaming
    always agree on what a duplicate is."""
    from serene_spark.operators.text_analysis import NORM

    return f"md5({NORM(SPARK_DIALECT)})"

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def read_documents_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a documents drop directory."""
    tune_session(spark)
    from pyspark.errors import AnalysisException

    try:
        schema = spark.read.parquet(docs_dir).schema
    except AnalysisException:
        schema = DOCS_DDL
    return spark.readStream.schema(schema).parquet(docs_dir)


def start_incremental_dedup(
    spark: SparkSession, docs_dir: str, index_dir: str, checkpoint_dir: str
):
    """Start the availableNow dedup sink; returns the streaming query.

    The persisted index at ``index_dir`` has schema
    (fp string, doc_id long, source string, epoch long) partitioned by epoch.
    """
    stream = read_documents_stream(spark, docs_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark_ = batch_df.sparkSession
        fps = (
            batch_df.select(
                F.expr(_fp_expr()).alias("fp"), "doc_id", "source"
            )
            # within-batch dedup: lowest doc_id wins (same rule as the batch op)
            .withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        from pyspark.errors import AnalysisException

        try:
            # exclude this epoch's own prior (replayed) output from "seen",
            # or a redelivered epoch would anti-join itself away
            seen = (
                spark_.read.parquet(index_dir)
                .filter(F.col("epoch") != epoch_id)
                .select("fp")
            )
        except AnalysisException:  # first epoch: no index yet — any OTHER
            seen = None            # read failure must fail the batch so the
                                   # checkpoint retries it (a swallowed error
                                   # here would poison the index with dups)
        fresh = fps if seen is None else fps.join(seen, "fp", "left_anti")
        (
            fresh.withColumn("epoch", F.lit(epoch_id))
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
    """Collapse the index's per-epoch partitions into one (the fp set is
    preserved exactly; the per-batch anti-join stops paying one file
    listing per historical micro-batch). Returns #epochs removed."""
    from serene_spark.streaming.compaction import compact_fp_index

    return compact_fp_index(spark, index_dir)
