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

* the merge reads ONLY the epoch partitions listed at entry (explicit
  paths, not the directory) — an epoch landed by a concurrent
  micro-batch between listing and merge is neither absorbed into the
  merged output nor deleted, so it contributes exactly once to every
  subsequent readout (absorbing it while also leaving its partition
  would double-count it in the SUM-based sinks);
* the merged state is written under an underscore-prefixed temp dir
  (invisible to parquet readers), renamed in as a fresh epoch BEFORE the
  listed partitions are deleted, so a concurrent reader always sees a
  SUPERSET of one complete valid log — never an empty or partial one.
  For the dedupe-merge sinks (kmv, quantile, fp index, growth index)
  the superset's union-merge readout is bit-identical by the merge
  lemma, so concurrent readers are fully safe; for the ADDITIVE sinks
  (matview, burn, drift) a reader inside the rename→delete window would
  double-count the not-yet-deleted inputs, so those sinks require no
  concurrent reader during compaction (single-maintenance-writer, the
  normal operational mode for an OPTIMIZE-style pass);
* the compacted partition gets a fresh NEGATIVE epoch id (one below the
  most negative listed id). foreachBatch batch ids are non-negative and
  monotonic, so (a) a crashed-and-redelivered batch whose partition
  existed but whose checkpoint commit did not can never dynamically
  overwrite the compacted partition (it recreates its own epoch id,
  which the union read side handles), and (b) unlike "highest listed
  id + 1", it can never collide with the NEXT batch id the restarted
  stream will legitimately write.

Re-running compaction is idempotent: a single-epoch log merges to itself.

Crash safety: every merged partition carries an ``_inputs.json``
manifest (underscore-prefixed, invisible to parquet readers) recording
every epoch id its state has EVER absorbed. The absorbed set is always
two contiguous prefixes — foreachBatch ids are non-negative, gapless
and monotonic (and batch N's partition exists on disk before batch N+1
starts, so a merge can never absorb id N+1 without having absorbed an
existing id N), while merged epochs descend -1, -2, … and every merge
absorbs all on-disk negatives — so the manifest is two O(1)
WATERMARKS, ``{"max_batch_absorbed": M, "min_merged_absorbed": m}``
(null = none absorbed of that sign), not a list that would otherwise
grow linearly with stream lifetime: any on-disk epoch id in
``[0, M] ∪ [m, -1]`` is absorbed. (A gap id below M whose batch wrote
no partition stays absent forever — a checkpoint redelivers only
UNcommitted batches, and a committed batch above it proves it
committed — so the range-claim over never-materialized ids is vacuous.)
Each merge takes the max/min over its inputs' manifests, so the
lineage survives repeated compactions at constant metadata size.
Legacy explicit-id-list manifests from older versions of this protocol
are still read (collapsed to their watermarks), so an existing log
upgrades in place on its next compaction. The
rename's boolean return is checked before anything is deleted (Hadoop
filesystems report most rename failures by returning false — deleting
the inputs after a failed rename would lose the whole history). A crash
between the rename and the input deletes leaves a window where
additive-sink readouts double-count the absorbed inputs; the NEXT
compaction run heals it by deleting every on-disk epoch inside the
manifest's watermarks before merging anything, so the corruption is
never baked into a subsequent merge. The same mechanism heals a
crashed-and-redelivered batch whose content a completed merge already
holds — even an ANCIENT id replayed many compactions later, since the
watermarks only ever widen. Two hard guards:
heal refuses a merged partition missing Spark's ``_SUCCESS`` marker (a
non-atomic-rename store — S3A — can leave a partially-copied partition;
deleting its inputs would lose rows), and an unparseable manifest is an
actionable error, never silently ignored. Contract: a partials dir is
bound to ONE streaming-checkpoint lineage — after a checkpoint reset,
use a fresh dir (fresh batches would otherwise reuse absorbed ids; the
raw sinks' dynamic-overwrite idempotency is equally broken by reuse).

All filesystem work goes through the Hadoop FileSystem API of the active
session, so the same code compacts a local dir under pytest and an
HDFS/S3 prefix on a cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Test-only fault-injection point: when set, called with a stage name at
# designated crash windows inside _epoch_swap ("post_rename" = after the
# merged epoch renamed in, before any input delete). A hook that raises
# simulates a process crash at exactly that point; production never sets
# it. Used by tests/test_compaction_concurrency.py to drive a REAL
# foreachBatch stream through a mid-swap crash and verify heal-on-next-run.
_test_fault_hook = None


def _epoch_swap(spark: SparkSession, log_dir: str, build_merged) -> int:
    """Shared swap machinery: list ``epoch=*`` partitions, materialize
    ``build_merged(listed_paths)`` — which must read ONLY those paths —
    into an underscore-prefixed temp dir (invisible to readers), rename
    the merge in as a fresh negative epoch id, THEN delete the listed
    partitions (a concurrent reader always sees a superset; see module
    docstring for the per-sink-family guarantees). Returns #partitions
    removed (0 = already compact, nothing rewritten)."""
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(log_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    base = log_dir.rstrip("/")

    def list_epochs() -> list[tuple[int, object]]:
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("epoch="):
                out.append((int(name.split("=", 1)[1]), st.getPath()))
        return out

    epochs = list_epochs()

    # crash recovery + replay memory: every merged partition carries an
    # _inputs.json manifest (underscore-prefixed — invisible to parquet
    # readers) holding the two absorbed-id WATERMARKS (see module
    # docstring for why the absorbed set is always the two prefixes
    # [0, M] and [m, -1]). An absorbed id found on disk is either an
    # interrupted swap's leftover or a redelivered uncommitted
    # batch whose content is already in the merge — both are healed by
    # deleting it, or a re-run would bake the additive double count into
    # the next merge. Guards: the merged data must carry Spark's
    # _SUCCESS marker (heal never trusts a partially-copied partition on
    # a non-atomic-rename store), and a manifest that exists but cannot
    # be parsed is a hard, actionable error — silently merging over it
    # could double-count. NOTE the lineage contract: a partials dir is
    # bound to ONE checkpoint lineage; resetting the checkpoint and
    # reusing the dir would make fresh batches reuse absorbed ids (the
    # raw sinks' own dynamic-overwrite idempotency is equally broken by
    # that — reset => fresh dir).
    max_batch: int | None = None   # highest non-negative id ever absorbed
    min_merged: int | None = None  # lowest (most negative) merged id absorbed
    for e, p in epochs:
        if e < 0:
            mf = jvm.org.apache.hadoop.fs.Path(f"{base}/epoch={e}/_inputs.json")
            if not fs.exists(mf):
                continue
            ok = jvm.org.apache.hadoop.fs.Path(f"{base}/epoch={e}/_SUCCESS")
            if not fs.exists(ok):
                raise IOError(
                    f"compaction manifest {mf} present without _SUCCESS: "
                    "the merged partition is incomplete (non-atomic rename "
                    "interrupted?) — inspect and remove it by hand; its "
                    "inputs are still intact")
            stream = fs.open(mf)
            try:
                raw = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
            finally:
                stream.close()
            try:
                doc = json.loads(raw.decode("utf-8"))
                if isinstance(doc, list):
                    # legacy explicit-id-list manifest: collapse to its
                    # watermarks (under the gapless-batch-id contract the
                    # list was always exactly the two prefixes)
                    mb = max((i for i in doc if i >= 0), default=None)
                    mm = min((i for i in doc if i < 0), default=None)
                else:
                    mb = doc["max_batch_absorbed"]
                    mm = doc["min_merged_absorbed"]
            except (ValueError, KeyError, TypeError) as exc:
                raise IOError(
                    f"unreadable compaction manifest {mf}: {exc} — the "
                    "swap it recorded cannot be healed automatically; "
                    "inspect the partition and remove the manifest by "
                    "hand") from exc
            if mb is not None:
                max_batch = mb if max_batch is None else max(max_batch, mb)
            if mm is not None:
                min_merged = mm if min_merged is None else min(min_merged, mm)

    def is_absorbed(e: int) -> bool:
        if e >= 0:
            return max_batch is not None and e <= max_batch
        return min_merged is not None and e >= min_merged

    healed = 0
    for e, p in epochs:
        if is_absorbed(e):
            fs.delete(p, True)
            healed += 1
    if healed:
        epochs = list_epochs()

    if len(epochs) <= 1:
        return healed

    # fresh id below every listed one; batch ids are >= 0, so negative
    # ids can never be redelivered-over or collide with future batches
    merged_epoch = min(-1, min(e for e, _ in epochs) - 1)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base}/_compact_tmp")
    # the merge must see exactly the listed inputs — not the directory,
    # which a concurrent micro-batch may have extended since the listing
    build_merged([str(p) for _e, p in epochs]).write.mode(
        "overwrite").parquet(str(tmp))
    manifest = fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{base}/_compact_tmp/_inputs.json"),
        True)
    try:
        # cumulative lineage at O(1) size: widen the watermarks over this
        # merge's inputs PLUS everything those inputs had themselves
        # absorbed, so replay of any ancient uncommitted batch id is
        # still recognized after arbitrarily many compactions while the
        # manifest stays two integers for the stream's whole lifetime
        new_max = max(
            (x for x in [max_batch, *(e for e, _ in epochs if e >= 0)]
             if x is not None), default=None)
        new_min = min(
            (x for x in [min_merged, *(e for e, _ in epochs if e < 0)]
             if x is not None), default=None)
        manifest.write(bytearray(json.dumps(
            {"max_batch_absorbed": new_max,
             "min_merged_absorbed": new_min}).encode("utf-8")))
    finally:
        manifest.close()
    dest = jvm.org.apache.hadoop.fs.Path(f"{base}/epoch={merged_epoch}")
    if not fs.rename(tmp, dest):
        # Hadoop filesystems report most rename failures by returning
        # false, not raising; deleting the inputs anyway would lose the
        # entire compacted history
        raise IOError(f"compaction rename failed: {tmp} -> {dest}")
    if _test_fault_hook is not None:
        _test_fault_hook("post_rename")
    for _e, p in epochs:
        fs.delete(p, True)
    return healed + len(epochs)


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
    cols = ["event_type", *value_cols]

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .select(*cols)
            .distinct()
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("event_type").orderBy("u")),
            )
            .where(F.col("rk") <= k)
            .select(*cols)
            .repartition(1)  # |types| x K rows — one file is right
        )

    return _epoch_swap(spark, partials_dir, merged)


def compact_fp_index(spark: SparkSession, index_dir: str) -> int:
    """Collapse the incremental-dedup fingerprint index's epoch
    partitions into one. Unlike the sketch logs this state is NOT
    bounded — it is the full (fp, doc_id, source) survivor set — but it
    accretes one small partition per micro-batch forever, and the
    per-batch anti-join pays the file-listing and footer overhead of
    every one of them. The fp set is exactly preserved (epochs are
    disjoint on fp by the sink's anti-join; a defensive lowest-doc_id
    dedup guards the invariant anyway), so the read-side anti-join and
    every future batch behave identically. Returns #epochs removed."""

    def merged(paths):
        return (
            spark.read.parquet(*paths)
            .select("fp", "doc_id", "source")
            .withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .where(F.col("rk") == 1)
            .select("fp", "doc_id", "source")
        )

    return _epoch_swap(spark, index_dir, merged)
