"""Streaming tier at sf10: drive the 10M-event / 500k-doc scale corpus
through the foreachBatch sinks in WAVES (incremental file drops, each
drained with an availableNow trigger restarting from the same
checkpoint — the production drop-directory pattern) and verify the two
bounded-state contracts at scale:

* ``kmv_stream``: the partial log stays <= |types| x K x epochs rows and
  the merged readout is BIT-IDENTICAL to the batch ``kmv_ndv_users``
  sketch of the same events (the merge lemma, now measured at sf10);
* ``quantile_stream``: same bound over (hash, value) row partials and
  the streamed p50/p90/p99 BIT-IDENTICAL to the batch
  ``quantile_sketch_bottomk``;
* ``incremental_dedup``: the fingerprint index is globally unique on fp,
  sized exactly like the batch distinct-fingerprint relation, and every
  fp matches the batch operator's md5(NORM(text)) set;
* ``compact_partials`` (both sketch sinks): the multi-epoch partial log
  merges back to ONE epoch of <= |types| x K rows, the readout stays
  bit-identical, and a second compaction is a no-op.

Usage: python tools/bench_stream_sf10.py [SF_DIR] [WAVES]
Prints one JSON line with wall times and state sizes (recorded in
BASELINE.md's streaming-at-sf10 section).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scale_data", "sf10")
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.session import get_spark
    from serene_spark.streaming.incremental_dedup import (
        _fp_expr,
        start_incremental_dedup,
    )
    from serene_spark.streaming.kmv_stream import read_kmv, start_kmv_stream
    from serene_spark.streaming.quantile_stream import (
        read_quantiles,
        start_quantile_stream,
    )

    spark = get_spark("serene-stream-sf10")
    out: dict = {"sf_dir": sf_dir, "waves": waves}
    work = tempfile.mkdtemp(prefix="serene-stream-sf10-")

    # --- prepare wave files: re-chunk each source into `waves` files ---------
    from serene_spark.catalog import load_table

    ev_src = os.path.join(work, "events_src")
    load_table(spark, sf_dir, "events").repartition(waves).write.parquet(ev_src)
    docs_src = os.path.join(work, "docs_src")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .repartition(waves).write.parquet(docs_src)
    ev_files = sorted(f for f in os.listdir(ev_src) if f.endswith(".parquet"))
    doc_files = sorted(f for f in os.listdir(docs_src) if f.endswith(".parquet"))

    # --- KMV monitor ----------------------------------------------------------
    drop = os.path.join(work, "events_drop")
    partials = os.path.join(work, "kmv_partials")
    ckpt = os.path.join(work, "kmv_ckpt")
    os.makedirs(drop)
    kmv_epochs, kmv_wave_secs = 0, []
    for wv in range(waves):
        shutil.copy(os.path.join(ev_src, ev_files[wv]), drop)
        t0 = time.time()
        q = start_kmv_stream(spark, drop, partials, ckpt)
        q.awaitTermination()
        kmv_wave_secs.append(round(time.time() - t0, 2))
        kmv_epochs += 1

    log = spark.read.parquet(partials)
    n_partial = log.count()
    n_types = log.select("event_type").distinct().count()
    from serene_spark.operators.sketches import KMV_K

    out["kmv"] = {
        "wave_secs": kmv_wave_secs,
        "epochs": kmv_epochs,
        "partial_rows": n_partial,
        "state_bound": n_types * KMV_K * kmv_epochs,
    }
    assert n_partial <= n_types * KMV_K * kmv_epochs, "state bound violated"

    t0 = time.time()
    streamed = {tuple(r) for r in read_kmv(spark, partials).collect()}
    out["kmv"]["readout_sec"] = round(time.time() - t0, 2)
    from serene_spark.registry import load_all

    batch = {
        tuple(r)
        for r in load_all()["kmv_ndv_users"].spark(spark, sf_dir)
        .select("event_type", "sketch_size", "ndv_est").collect()
    }
    assert streamed == batch, "streamed KMV readout != batch sketch"
    out["kmv"]["bit_identical_to_batch"] = True

    # --- quantile sketch monitor (own drop dir, wave-by-wave like KMV —
    # gives the log multiple epochs so compaction below has real work) -------
    qdrop = os.path.join(work, "events_drop_q")
    qpartials = os.path.join(work, "qsk_partials")
    qckpt = os.path.join(work, "qsk_ckpt")
    os.makedirs(qdrop)
    qsk_wave_secs = []
    qsk_epochs = 0
    for wv in range(waves):
        shutil.copy(os.path.join(ev_src, ev_files[wv]), qdrop)
        t0 = time.time()
        q = start_quantile_stream(spark, qdrop, qpartials, qckpt)
        q.awaitTermination()
        qsk_wave_secs.append(round(time.time() - t0, 2))
        qsk_epochs += 1

    qlog = spark.read.parquet(qpartials)
    from serene_spark.operators.sketches import QSK_K

    qn = qlog.count()
    out["quantiles"] = {
        "wave_secs": qsk_wave_secs,
        "epochs": qsk_epochs,
        "partial_rows": qn,
        "state_bound": n_types * QSK_K * qsk_epochs,
    }
    assert qn <= n_types * QSK_K * qsk_epochs, "state bound violated"
    t0 = time.time()
    q_stream = {tuple(r) for r in read_quantiles(spark, qpartials).collect()}
    out["quantiles"]["readout_sec"] = round(time.time() - t0, 2)
    q_batch = {
        tuple(r)
        for r in load_all()["quantile_sketch_bottomk"].spark(spark, sf_dir)
        .select("event_type", "sample_n", "p50_est", "p90_est", "p99_est")
        .collect()
    }
    assert q_stream == q_batch, "streamed quantile readout != batch sketch"
    out["quantiles"]["bit_identical_to_batch"] = True

    # --- compaction: each multi-epoch partial log merges back to ONE epoch,
    # readout bit-identical before/after, second run a no-op ------------------
    from serene_spark.streaming.kmv_stream import compact_partials as compact_kmv
    from serene_spark.streaming.quantile_stream import (
        compact_partials as compact_qsk,
    )

    for tag, pdir, compact, bound, expect in (
        ("kmv", partials, compact_kmv, n_types * KMV_K, batch),
        ("quantiles", qpartials, compact_qsk, n_types * QSK_K, q_batch),
    ):
        t0 = time.time()
        removed = compact(spark, pdir)
        csec = round(time.time() - t0, 2)
        post = spark.read.parquet(pdir)
        rows_after = post.count()
        assert post.select("epoch").distinct().count() == 1, f"{tag}: >1 epoch"
        assert rows_after <= bound, f"{tag}: compacted state above types x K"
        reader = read_kmv if tag == "kmv" else read_quantiles
        got = {tuple(r) for r in reader(spark, pdir).collect()}
        assert got == expect, f"{tag}: readout changed by compaction"
        assert compact(spark, pdir) == 0, f"{tag}: re-run not a no-op"
        out[f"compaction_{tag}"] = {
            "epochs_removed": removed,
            "sec": csec,
            "state_rows_after": rows_after,
            "state_bound": bound,
            "readout_bit_identical": True,
            "idempotent": True,
        }

    # --- incremental dedup ----------------------------------------------------
    ddrop = os.path.join(work, "docs_drop")
    index_dir = os.path.join(work, "fp_index")
    dckpt = os.path.join(work, "dedup_ckpt")
    os.makedirs(ddrop)
    dd_wave_secs = []
    for wv in range(waves):
        shutil.copy(os.path.join(docs_src, doc_files[wv]), ddrop)
        t0 = time.time()
        q = start_incremental_dedup(spark, ddrop, index_dir, dckpt)
        q.awaitTermination()
        dd_wave_secs.append(round(time.time() - t0, 2))

    idx = spark.read.parquet(index_dir)
    n_idx = idx.count()
    n_fp = idx.select("fp").distinct().count()
    assert n_idx == n_fp, "index not globally unique on fp"
    batch_fp = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .selectExpr(f"{_fp_expr()} AS fp").distinct().count()
    )
    assert n_fp == batch_fp, f"index {n_fp} != batch distinct fps {batch_fp}"
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    out["dedup"] = {
        "wave_secs": dd_wave_secs,
        "index_rows": n_idx,
        "batch_distinct_fps": batch_fp,
        "n_docs": n_docs,
        "fp_set_matches_batch": True,
    }

    # fp-index compaction: partitions collapse to one, fp set EXACTLY kept
    from serene_spark.streaming.incremental_dedup import compact_index

    fp_before = {r["fp"] for r in idx.select("fp").collect()}
    t0 = time.time()
    removed = compact_index(spark, index_dir)
    csec = round(time.time() - t0, 2)
    post = spark.read.parquet(index_dir)
    assert post.select("epoch").distinct().count() == 1
    fp_after = {r["fp"] for r in post.select("fp").collect()}
    assert fp_after == fp_before, "compaction changed the fp set"
    assert compact_index(spark, index_dir) == 0
    out["compaction_dedup_index"] = {
        "epochs_removed": removed,
        "sec": csec,
        "index_rows_after": post.count(),
        "fp_set_preserved": True,
        "idempotent": True,
    }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
