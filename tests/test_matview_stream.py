"""Streaming matview maintenance (streaming/matview_stream.py): the merged
view after N drains must equal the batch recompute over everything that
arrived, and epoch-partitioned partials must make replays idempotent."""

from __future__ import annotations

import shutil

from serene_spark.catalog import load_table
from serene_spark.functions.sqlgen import SPARK
from serene_spark.operators.matview import SPLIT_TS, matview_recompute_sql

SF = "/root/testdata/sf0.001"


def _normalize(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_streamed_view_equals_batch_recompute_across_drains(spark, tmp_path):
    from serene_spark.streaming.matview_stream import (
        read_matview,
        start_matview_stream,
    )

    events = load_table(spark, SF, "events")
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: the "historical" slice (flat single-file drop, as a feed would)
    events.filter(f"ts < TIMESTAMP '{SPLIT_TS}'").toPandas().to_parquet(
        str(events_dir / "a.parquet")
    )
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)

    # drain 2: the "new arrivals" slice lands later, same checkpoint
    events.filter(f"ts >= TIMESTAMP '{SPLIT_TS}'").toPandas().to_parquet(
        str(events_dir / "b.parquet")
    )
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)

    events.createOrReplaceTempView("events")
    got = _normalize(read_matview(spark, partials_dir))
    want = _normalize(spark.sql(matview_recompute_sql(SPARK)))
    assert got.shape == want.shape
    assert (got.values == want.values).all()
    spark.catalog.dropTempView("events")


def test_replay_is_idempotent(spark, tmp_path):
    """Deleting the checkpoint replays every epoch; epoch-partition
    overwrite must leave the merged view unchanged (no double counting)."""
    from serene_spark.streaming.matview_stream import (
        read_matview,
        start_matview_stream,
    )

    events = load_table(spark, SF, "events")
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    events.limit(5000).toPandas().to_parquet(str(events_dir / "a.parquet"))
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)
    before = _normalize(read_matview(spark, partials_dir))

    shutil.rmtree(ckpt)  # lose the checkpoint -> full replay from scratch
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)
    after = _normalize(read_matview(spark, partials_dir))
    assert before.shape == after.shape
    assert (before.values == after.values).all()


def test_streamed_anomalies_equal_batch_query(spark, tmp_path):
    """read_anomalies over the partial log must equal the batch
    events_hourly_anomalies query — continuous monitoring without
    rescanning raw events."""
    from serene_spark.registry import load_all
    from serene_spark.streaming.matview_stream import (
        read_anomalies,
        start_matview_stream,
    )

    events = load_table(spark, SF, "events")
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    events.toPandas().to_parquet(str(events_dir / "a.parquet"))
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)

    got = _normalize(read_anomalies(spark, partials_dir))
    want = _normalize(load_all()["events_hourly_anomalies"].spark(spark, SF))
    assert got.shape == want.shape
    assert (got.values == want.values).all()


def test_matview_compaction_invariant_and_composes(spark, tmp_path):
    """compact_partials folds the log to ONE epoch with the sink's EXACT
    write schema (a widened decimal would split the log's parquet schema),
    read_matview is invariant (algebraic partials), re-run is a no-op,
    and a drain landing AFTER compaction still merges to the batch
    recompute of everything that ever arrived."""
    import pandas as pd

    from serene_spark.streaming.matview_stream import (
        compact_partials,
        read_matview,
        start_matview_stream,
    )

    events = load_table(spark, SF, "events")
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    pdf = events.toPandas().sort_values("ts").reset_index(drop=True)
    thirds = [pdf.iloc[:600], pdf.iloc[600:1200], pdf.iloc[1200:]]
    for i, chunk in enumerate(thirds[:2]):
        chunk.to_parquet(str(events_dir / f"w{i}.parquet"))
        q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
        assert q.awaitTermination(300)

    schema_before = spark.read.parquet(partials_dir).drop("epoch").schema
    before = _normalize(read_matview(spark, partials_dir))
    n_epochs = spark.read.parquet(partials_dir).select("epoch").distinct().count()
    assert n_epochs >= 2

    assert compact_partials(spark, partials_dir) == n_epochs
    post = spark.read.parquet(partials_dir)
    assert post.select("epoch").distinct().count() == 1
    # exact write TYPES (nullability may differ: count is non-nullable,
    # sum is nullable — irrelevant to parquet reads; the hazard is a
    # WIDENED decimal splitting the log's schema across files)
    assert [(f.name, f.dataType) for f in post.drop("epoch").schema] == [
        (f.name, f.dataType) for f in schema_before
    ]
    pd.testing.assert_frame_equal(
        _normalize(read_matview(spark, partials_dir)), before
    )
    assert compact_partials(spark, partials_dir) == 0

    # the last third arrives AFTER compaction: view == batch over ALL events
    thirds[2].to_parquet(str(events_dir / "w2.parquet"))
    q = start_matview_stream(spark, str(events_dir), partials_dir, ckpt)
    assert q.awaitTermination(300)
    events.createOrReplaceTempView("events")
    pd.testing.assert_frame_equal(
        _normalize(read_matview(spark, partials_dir)),
        _normalize(spark.sql(matview_recompute_sql(SPARK))),
    )
