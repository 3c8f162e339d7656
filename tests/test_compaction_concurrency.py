"""Compaction concurrency contracts (streaming/compaction.py):

* the swap renames the merged epoch in BEFORE deleting its inputs, so a
  concurrent reader of a dedupe-merge sink (kmv, fp index) always sees a
  superset whose union-merge readout is bit-identical (merge lemma);
* the merge reads ONLY the epoch partitions listed at entry — an epoch
  landed by a concurrent micro-batch between listing and merge is neither
  absorbed into the merged output nor deleted, so a SUM-based sink counts
  it exactly once (the round-10 double-count defect);
* the compacted state lives at a NEGATIVE epoch id, so a crashed-and-
  redelivered micro-batch (whose partition existed but whose checkpoint
  commit did not) can never dynamically overwrite the merged history.
"""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F


def _write_epoch(spark, log_dir: str, epoch: int, pdf: pd.DataFrame) -> None:
    (
        spark.createDataFrame(pdf)
        .withColumn("epoch", F.lit(epoch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(log_dir)
    )


def _kmv_log(spark, log_dir: str) -> None:
    _write_epoch(spark, log_dir, 0, pd.DataFrame({
        "event_type": ["a", "a", "b"], "u": [0.10, 0.30, 0.25]}))
    _write_epoch(spark, log_dir, 1, pd.DataFrame({
        "event_type": ["a", "a", "b"], "u": [0.10, 0.20, 0.05]}))


def test_mid_swap_superset_readout_identical(spark, tmp_path):
    """The reader-visible intermediate state of the swap is the merged
    epoch ALONGSIDE the not-yet-deleted inputs. For the dedupe-merge
    sinks that superset must read out bit-identically — constructed here
    explicitly by grafting a compacted run's merged partition back into
    the uncompacted log."""
    from serene_spark.streaming.kmv_stream import compact_partials, read_kmv

    log = str(tmp_path / "kmv")
    _kmv_log(spark, log)
    before = read_kmv(spark, log).toPandas().reset_index(drop=True)

    twin = str(tmp_path / "kmv_twin")
    shutil.copytree(log, twin)
    assert compact_partials(spark, twin) == 2
    merged = [p for p in (tmp_path / "kmv_twin").iterdir()
              if p.name.startswith("epoch=")]
    assert [p.name for p in merged] == ["epoch=-1"]
    shutil.copytree(merged[0], tmp_path / "kmv" / "epoch=-1")

    mid_swap = read_kmv(spark, log).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(mid_swap, before)

    # same invariant for the fp index: the deduped (fp, doc_id, source)
    # set of the superset equals the original's
    from serene_spark.streaming.compaction import compact_fp_index

    idx = str(tmp_path / "fp")
    _write_epoch(spark, idx, 0, pd.DataFrame({
        "fp": ["f1", "f2"], "doc_id": [1, 2], "source": ["s", "s"]}))
    _write_epoch(spark, idx, 1, pd.DataFrame({
        "fp": ["f3"], "doc_id": [3], "source": ["s"]}))
    read = lambda d: sorted(
        spark.read.parquet(d).select("fp", "doc_id", "source")
        .distinct().toPandas().itertuples(index=False))
    before_fp = read(idx)
    twin_fp = str(tmp_path / "fp_twin")
    shutil.copytree(idx, twin_fp)
    assert compact_fp_index(spark, twin_fp) == 2
    shutil.copytree(tmp_path / "fp_twin" / "epoch=-1", tmp_path / "fp" / "epoch=-1")
    assert read(idx) == before_fp


def test_interleaved_epoch_neither_absorbed_nor_deleted(spark, tmp_path):
    """An epoch landed between listing and merge must contribute exactly
    once afterwards. Simulated by landing epoch=7 from inside the
    build_merged hook — i.e. after _epoch_swap's listing, before its
    write executes — against a SUM-based (burn) log, where absorbing it
    while leaving its partition would double-count it."""
    from serene_spark.streaming.compaction import _epoch_swap

    log = str(tmp_path / "burn")
    _write_epoch(spark, log, 0, pd.DataFrame(
        {"h": [100], "n": [5], "errs": [1]}))
    _write_epoch(spark, log, 1, pd.DataFrame(
        {"h": [100, 101], "n": [3, 2], "errs": [0, 2]}))

    def merged(paths):
        # the concurrent micro-batch: lands AFTER the listing
        _write_epoch(spark, log, 7, pd.DataFrame(
            {"h": [101], "n": [10], "errs": [1]}))
        return (spark.read.parquet(*paths).groupBy("h")
                .agg(F.sum("n").alias("n"), F.sum("errs").alias("errs")))

    assert _epoch_swap(spark, log, merged) == 2

    names = sorted(p.name for p in (tmp_path / "burn").iterdir()
                   if p.name.startswith("epoch="))
    assert names == ["epoch=-1", "epoch=7"]  # interleaver survives intact
    totals = (spark.read.parquet(log).groupBy("h")
              .agg(F.sum("n").alias("n"), F.sum("errs").alias("errs"))
              .toPandas().sort_values("h").reset_index(drop=True))
    pd.testing.assert_frame_equal(totals, pd.DataFrame(
        {"h": [100, 101], "n": [8, 12], "errs": [1, 3]}),
        check_dtype=False)


def test_crash_between_rename_and_deletes_heals(spark, tmp_path):
    """A crash after the merged epoch renamed in but before the inputs
    were deleted leaves {merged, inputs} on disk — an additive sink
    double-counts until repaired. The next compaction must finish the
    interrupted deletes from the merged partition's _inputs.json
    manifest BEFORE merging, or the double count would be baked into
    epoch=-2 forever."""
    from serene_spark.streaming.burn_stream import compact_partials, read_burn

    log = str(tmp_path / "burn")
    _write_epoch(spark, log, 0, pd.DataFrame(
        {"h": [100], "n": [5], "errs": [1]}))
    _write_epoch(spark, log, 1, pd.DataFrame(
        {"h": [100, 101], "n": [3, 2], "errs": [0, 2]}))
    true_burn = read_burn(spark, log).toPandas().sort_values("epoch_hour")

    # construct the exact post-crash state: compact a twin, then graft
    # its merged partition back WITHOUT deleting the originals
    twin = str(tmp_path / "burn_twin")
    shutil.copytree(log, twin)
    assert compact_partials(spark, twin) == 2
    shutil.copytree(tmp_path / "burn_twin" / "epoch=-1",
                    tmp_path / "burn" / "epoch=-1")
    # mid-crash readout over {−1, 0, 1} double-counts — the documented
    # additive-sink exposure this heal exists for
    doubled = (spark.read.parquet(log).groupBy("h")
               .agg(F.sum("n").alias("n")).toPandas())
    assert doubled.n.sum() == 2 * (5 + 3 + 2)

    # the heal: absorbed inputs {0, 1} deleted from the manifest, no
    # re-merge of the doubled state
    assert compact_partials(spark, log) == 2
    names = [p.name for p in (tmp_path / "burn").iterdir()
             if p.name.startswith("epoch=")]
    assert names == ["epoch=-1"]
    healed = read_burn(spark, log).toPandas().sort_values("epoch_hour")
    pd.testing.assert_frame_equal(
        healed.reset_index(drop=True), true_burn.reset_index(drop=True))


def test_manifest_guards_incomplete_and_corrupt(spark, tmp_path):
    """Heal must refuse to act on a merged partition that is not
    provably complete: a manifest without Spark's _SUCCESS marker means
    a non-atomic rename (S3A-class) was interrupted mid-copy — deleting
    the named inputs against a partial merge would lose rows. And an
    unparseable manifest is an actionable hard error, never silently
    ignored (merging over it could double-count)."""
    import pytest

    from serene_spark.streaming.kmv_stream import compact_partials

    log = str(tmp_path / "kmv")
    _kmv_log(spark, log)
    assert compact_partials(spark, log) == 2
    _write_epoch(spark, log, 2, pd.DataFrame(
        {"event_type": ["b"], "u": [0.4]}))

    # (a) strip _SUCCESS from the merged partition: heal must refuse
    success = tmp_path / "kmv" / "epoch=-1" / "_SUCCESS"
    success.rename(tmp_path / "kmv" / "epoch=-1" / "_success_moved")
    with pytest.raises(IOError, match="without _SUCCESS"):
        compact_partials(spark, log)
    (tmp_path / "kmv" / "epoch=-1" / "_success_moved").rename(success)

    # (b) truncate the manifest: hard, named error
    mf = tmp_path / "kmv" / "epoch=-1" / "_inputs.json"
    good = mf.read_bytes()
    mf.write_bytes(b"")
    with pytest.raises(IOError, match="unreadable compaction manifest"):
        compact_partials(spark, log)
    mf.write_bytes(good)
    assert compact_partials(spark, log) == 2  # restored: swap proceeds


def test_manifest_lineage_is_cumulative(spark, tmp_path):
    """Each merge's manifest widens its inputs' watermarks, so a replay
    of an ANCIENT uncommitted batch id — arriving after several further
    compactions — is still recognized as absorbed and healed, instead of
    being re-merged (an additive sink would double-count it)."""
    import json

    from serene_spark.streaming.kmv_stream import compact_partials, read_kmv

    log = str(tmp_path / "kmv")
    _kmv_log(spark, log)
    assert compact_partials(spark, log) == 2  # -> epoch=-1 absorbing [0, 1]
    _write_epoch(spark, log, 2, pd.DataFrame(
        {"event_type": ["b"], "u": [0.4]}))
    assert compact_partials(spark, log) == 2  # -> epoch=-2 absorbing {-1, 2}
    manifest = json.loads(
        (tmp_path / "kmv" / "epoch=-2" / "_inputs.json").read_text())
    assert manifest == {"max_batch_absorbed": 2, "min_merged_absorbed": -1}
    before = read_kmv(spark, log).toPandas().reset_index(drop=True)

    # ancient batch 1 redelivered two compactions later
    _write_epoch(spark, log, 1, pd.DataFrame({
        "event_type": ["a", "a", "b"], "u": [0.10, 0.20, 0.05]}))
    assert compact_partials(spark, log) == 1  # healed, not re-merged
    names = [p.name for p in (tmp_path / "kmv").iterdir()
             if p.name.startswith("epoch=")]
    assert names == ["epoch=-2"]
    pd.testing.assert_frame_equal(
        read_kmv(spark, log).toPandas().reset_index(drop=True), before)


def test_redelivered_batch_cannot_clobber_compacted_state(spark, tmp_path):
    """After a crash where epoch=1's partition landed but its checkpoint
    commit did not, the restarted stream redelivers batch 1 and
    dynamically overwrites epoch=1. With the compacted state at a
    negative id (instead of reusing the highest listed id) that replay
    recreates its own partition and the readout is unchanged — instead
    of replacing the entire merged history with one batch's rows."""
    from serene_spark.streaming.kmv_stream import compact_partials, read_kmv

    log = str(tmp_path / "kmv")
    _kmv_log(spark, log)
    before = read_kmv(spark, log).toPandas().reset_index(drop=True)
    assert compact_partials(spark, log) == 2

    # checkpoint replay of batch 1 (same rows, same epoch id)
    _write_epoch(spark, log, 1, pd.DataFrame({
        "event_type": ["a", "a", "b"], "u": [0.10, 0.20, 0.05]}))

    names = sorted(p.name for p in (tmp_path / "kmv").iterdir()
                   if p.name.startswith("epoch="))
    assert names == ["epoch=-1", "epoch=1"]  # merged history intact
    after = read_kmv(spark, log).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(after, before)

    # a later compaction recognizes the replayed partition from the
    # merged epoch's _inputs.json manifest (batch 1 was already absorbed)
    # and HEALS it away instead of re-merging — for an additive sink a
    # re-merge would double-count the replayed content
    assert compact_partials(spark, log) == 1
    names = [p.name for p in (tmp_path / "kmv").iterdir()
             if p.name.startswith("epoch=")]
    assert names == ["epoch=-1"]
    pd.testing.assert_frame_equal(
        read_kmv(spark, log).toPandas().reset_index(drop=True), before)


def test_watermark_manifest_constant_size_many_cycles(spark, tmp_path):
    """The round-12 O(1) manifest: after ANY number of batch+compaction
    cycles the manifest is exactly the two-watermark dict — its byte size
    is bounded by the integer widths, not by how many epochs the stream
    has ever absorbed (the round-11 list format grew linearly with stream
    lifetime). Also pins that an ancient replay heals against a PURE
    watermark manifest (no explicit id list anywhere on disk)."""
    import json

    from serene_spark.streaming.kmv_stream import compact_partials, read_kmv

    log = str(tmp_path / "kmv")
    _write_epoch(spark, log, 0, pd.DataFrame({
        "event_type": ["a", "b"], "u": [0.10, 0.50]}))
    sizes = []
    for batch in range(1, 9):
        _write_epoch(spark, log, batch, pd.DataFrame({
            "event_type": ["a", "b"], "u": [0.1 + batch / 100, 0.5 - batch / 100]}))
        assert compact_partials(spark, log) == 2
        merged = [p for p in (tmp_path / "kmv").iterdir()
                  if p.name.startswith("epoch=")]
        assert len(merged) == 1
        mf = merged[0] / "_inputs.json"
        doc = json.loads(mf.read_text())
        assert doc["max_batch_absorbed"] == batch
        sizes.append(len(mf.read_bytes()))
    # constant metadata: every manifest is the same two-key shape, byte
    # size flat across 8 cycles (vs +~4 bytes/epoch for the list format)
    assert set(doc) == {"max_batch_absorbed", "min_merged_absorbed"}
    assert max(sizes) - min(sizes) <= 2  # only integer-width wiggle
    before = read_kmv(spark, log).toPandas().reset_index(drop=True)

    # ancient replay (batch 3, five compactions ago) healed from the
    # watermark alone
    _write_epoch(spark, log, 3, pd.DataFrame({
        "event_type": ["a"], "u": [0.13]}))
    assert compact_partials(spark, log) == 1
    pd.testing.assert_frame_equal(
        read_kmv(spark, log).toPandas().reset_index(drop=True), before)


def test_legacy_list_manifest_upgrades_in_place(spark, tmp_path):
    """A log written by the round-11 protocol carries explicit-id-list
    manifests; the watermark reader must (a) heal from them identically
    and (b) rewrite the next merge's manifest in watermark form — an
    existing on-disk log upgrades with no migration step."""
    import json

    from serene_spark.streaming.kmv_stream import compact_partials, read_kmv

    log = str(tmp_path / "kmv")
    _kmv_log(spark, log)
    assert compact_partials(spark, log) == 2
    # rewrite the fresh manifest in the legacy list format
    mf = tmp_path / "kmv" / "epoch=-1" / "_inputs.json"
    assert json.loads(mf.read_text()) == {
        "max_batch_absorbed": 1, "min_merged_absorbed": None}
    mf.write_text(json.dumps([0, 1]))
    # drop the Hadoop local-FS checksum sidecar the hand-rewrite invalidated
    crc = tmp_path / "kmv" / "epoch=-1" / "._inputs.json.crc"
    if crc.exists():
        crc.unlink()
    before = read_kmv(spark, log).toPandas().reset_index(drop=True)

    # replayed batch 1 healed from the legacy manifest
    _write_epoch(spark, log, 1, pd.DataFrame({
        "event_type": ["a", "a", "b"], "u": [0.10, 0.20, 0.05]}))
    assert compact_partials(spark, log) == 1
    pd.testing.assert_frame_equal(
        read_kmv(spark, log).toPandas().reset_index(drop=True), before)

    # next real merge: legacy watermarks carried forward, new format out
    _write_epoch(spark, log, 2, pd.DataFrame(
        {"event_type": ["b"], "u": [0.4]}))
    assert compact_partials(spark, log) == 2
    doc = json.loads(
        (tmp_path / "kmv" / "epoch=-2" / "_inputs.json").read_text())
    assert doc == {"max_batch_absorbed": 2, "min_merged_absorbed": -1}


def test_crash_under_live_stream_heals_end_to_end(spark, tmp_path):
    """Integration pin for the full protocol under a REAL foreachBatch
    stream: run the kmv maintenance stream, crash compaction between the
    rename and the input deletes via the fault-injection hook, verify the
    mid-crash superset still reads out bit-identically (dedupe-merge
    sink), let the LIVE stream keep appending epochs over the crashed
    state, then run compaction again and verify it heals the leftovers
    and the final readout equals the batch sketch of all data."""
    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all
    from serene_spark.streaming import compaction
    from serene_spark.streaming.kmv_stream import (
        compact_partials,
        read_kmv,
        start_kmv_stream,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").toPandas()
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    # two micro-batches land via the real stream (events at sf0.001 is
    # 1000 rows — splits chosen so every chunk is nonempty)
    for i, chunk in enumerate([ev.iloc[:400], ev.iloc[400:700]]):
        chunk.to_parquet(str(events_dir / f"chunk{i}.parquet"))
        q = start_kmv_stream(spark, str(events_dir), partials, ckpt)
        assert q.awaitTermination(300)
    before = read_kmv(spark, partials).toPandas().reset_index(drop=True)

    # compaction crashes after rename, before any delete
    def crash(stage):
        raise RuntimeError(f"injected crash at {stage}")

    compaction._test_fault_hook = crash
    try:
        import pytest

        with pytest.raises(RuntimeError, match="injected crash at post_rename"):
            compact_partials(spark, partials)
    finally:
        compaction._test_fault_hook = None

    # post-crash state: merged epoch + both inputs — superset readout
    # bit-identical for this dedupe-merge sink
    names = sorted(p.name for p in (tmp_path / "partials").iterdir()
                   if p.name.startswith("epoch="))
    assert names == ["epoch=-1", "epoch=0", "epoch=1"]
    pd.testing.assert_frame_equal(
        read_kmv(spark, partials).toPandas().reset_index(drop=True), before)

    # the live stream keeps going over the crashed state (batch id 2)
    ev.iloc[700:].to_parquet(str(events_dir / "chunk2.parquet"))
    q = start_kmv_stream(spark, str(events_dir), partials, ckpt)
    assert q.awaitTermination(300)

    # next compaction heals {0, 1} from the manifest, then merges
    # {-1, 2} — 4 partitions removed in total
    assert compact_partials(spark, partials) == 4
    names = [p.name for p in (tmp_path / "partials").iterdir()
             if p.name.startswith("epoch=")]
    assert names == ["epoch=-2"]
    batch = load_all()["kmv_ndv_users"].spark(spark, sf).toPandas()[
        ["event_type", "sketch_size", "ndv_est"]
    ].sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        read_kmv(spark, partials).toPandas().reset_index(drop=True),
        batch, check_dtype=False)
