"""Partial-log compaction for the streaming sketch sinks — the operation
kmv_stream.py and quantile_stream.py promise in their module docstrings
("compaction = the read-side merge materialized back as a single epoch").

Both sinks append one `epoch=<id>` partition of per-type bottom-K rows per
micro-batch, so the log grows by |types| x K rows per epoch forever. The
merge lemma that makes the readout exact also makes compaction exact: the
global bottom-K of the union IS the union's sketch, so replacing every
epoch partition with that single merged bottom-K

* leaves every subsequent readout BIT-IDENTICAL (the read side performs
  the same merge over a now-smaller log), and
* composes with future stream epochs (a member of the global bottom-K of
  `compacted ∪ new` survives the compacted partial exactly as it would
  have survived the original epoch partials).

Safety alongside the streaming writer:

* only the epoch partitions LISTED at entry are deleted — an epoch landed
  by a concurrent micro-batch after the listing is never touched, and the
  union semantics of the read side make the interleaving harmless;
* the merged state is written under an underscore-prefixed temp dir
  (invisible to parquet readers) and swapped in via a filesystem rename,
  so a reader never observes a partially-written epoch;
* the compacted partition reuses the HIGHEST listed epoch id — an id the
  checkpoint has already committed, so foreachBatch can never redeliver
  (and dynamically overwrite) it; fresh epochs always get higher ids.

Re-running compaction is idempotent: a single-epoch log merges to itself.

All filesystem work goes through the Hadoop FileSystem API of the active
session, so the same code compacts a local dir under pytest and an
HDFS/S3 prefix on a cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compact_partials(
    spark: SparkSession,
    partials_dir: str,
    *,
    value_cols: tuple[str, ...],
    k: int,
) -> int:
    """Merge every epoch partition of a sketch partial log into one.

    ``value_cols``: the per-row payload after ``event_type`` — ``("u",)``
    for the KMV sink, ``("u", "v")`` for the quantile sink; rows are
    deduped on the full tuple and ranked by ``u`` (both read sides'
    convention). Returns the number of epoch partitions removed (0 =
    log was already compact; nothing rewritten).
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(partials_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())

    epochs: list[tuple[int, object]] = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch="):
            epochs.append((int(name.split("=", 1)[1]), st.getPath()))
    if len(epochs) <= 1:
        return 0

    keep_epoch = max(e for e, _ in epochs)
    cols = ["event_type", *value_cols]
    merged = (
        spark.read.parquet(partials_dir)
        .select(*cols)
        .distinct()
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("event_type").orderBy("u")),
        )
        .where(F.col("rk") <= k)
        .select(*cols)
        .repartition(1)  # |types| x K rows — one file is the right shape
    )

    base = partials_dir.rstrip("/")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base}/_compact_tmp")
    # materialize the merge BEFORE deleting its inputs
    merged.write.mode("overwrite").parquet(str(tmp))
    for _e, p in epochs:
        fs.delete(p, True)
    fs.rename(tmp, jvm.org.apache.hadoop.fs.Path(f"{base}/epoch={keep_epoch}"))
    return len(epochs)
