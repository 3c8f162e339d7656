"""Two-drain pin for the streaming growth sink: the persisted activity
index must reproduce the batch users_new_vs_returning counts exactly,
across file arrivals and query restarts, with cross-epoch first-day
attribution and idempotent replays."""

from __future__ import annotations

import datetime

import pandas as pd


def _write_events(path, rows):
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(path)


def test_two_drain_matches_batch_twin(spark, tmp_path):
    from serene_spark.streaming.growth_stream import (
        read_new_vs_returning,
        start_new_vs_returning,
    )

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    index_dir = str(tmp_path / "growth_index")
    ckpt = str(tmp_path / "ckpt")

    t0 = datetime.datetime(2024, 2, 1, 10, 0, 0)

    def ev(eid, day, user):
        return (eid, t0 + datetime.timedelta(days=day), user, "click", 1.0, "{}")

    # drop 1 (days 0-1): users 1,2,3 appear day 0; user 1 again day 1
    _write_events(
        events_dir / "a.parquet",
        [ev(1, 0, 1), ev(2, 0, 1), ev(3, 0, 2), ev(4, 0, 3), ev(5, 1, 1)],
    )
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)

    out1 = {r["day_bucket"]: r for r in read_new_vs_returning(spark, index_dir).collect()}
    d0 = min(out1)
    assert out1[d0]["new_users"] == 3 and out1[d0]["returning_users"] == 0
    assert out1[d0 + 1]["new_users"] == 0 and out1[d0 + 1]["returning_users"] == 1

    # drop 2 (days 2-3, SAME checkpoint -> new epoch): user 2 returns,
    # user 4 is brand new, user 1 active again on both days; plus a
    # REPLAYED day-1 activity of user 1 (same user-day as epoch 1 -> the
    # index anti-join must not double count it)
    _write_events(
        events_dir / "b.parquet",
        [ev(6, 2, 2), ev(7, 2, 4), ev(8, 2, 1), ev(9, 3, 1), ev(10, 1, 1)],
    )
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)

    out2 = {r["day_bucket"]: r for r in read_new_vs_returning(spark, index_dir).collect()}
    assert out2[d0]["new_users"] == 3
    assert out2[d0 + 1]["active_users"] == 1  # replayed user-day NOT doubled
    assert out2[d0 + 2]["active_users"] == 3
    assert out2[d0 + 2]["new_users"] == 1          # user 4 only
    assert out2[d0 + 2]["returning_users"] == 2    # users 1 and 2
    assert out2[d0 + 3]["active_users"] == 1 and out2[d0 + 3]["new_users"] == 0

    # conservation + equality with the batch twin over the SAME corpus
    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.experiments import new_vs_returning_sql

    from pyspark.sql import functions as F

    batch_events = spark.read.parquet(str(events_dir))
    if dict(batch_events.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) corpus
        batch_events = batch_events.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    elif dict(batch_events.dtypes).get("ts") == "timestamp_ntz":
        batch_events = batch_events.withColumn("ts", F.col("ts").cast("timestamp"))
    batch_events.createOrReplaceTempView("events")
    batch = {
        r["day_bucket"]: r for r in spark.sql(new_vs_returning_sql(SPARK_D)).collect()
    }
    spark.catalog.dropTempView("events")
    assert set(batch) == set(out2)
    for day, b in batch.items():
        s = out2[day]
        assert (
            s["active_users"], s["new_users"], s["returning_users"]
        ) == (b["active_users"], b["new_users"], b["returning_users"]), day

    # restart with no new files: index unchanged (idempotent drain)
    before = sorted(map(tuple, spark.read.parquet(index_dir).collect()))
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)
    after = sorted(map(tuple, spark.read.parquet(index_dir).collect()))
    assert before == after


def test_growth_index_compaction_invariant_and_composes(spark, tmp_path):
    """compact_index collapses the (user, day, is_first) index to ONE
    epoch preserving the exact row set; the daily readout is invariant,
    re-run a no-op, and a post-compaction drop still anti-joins against
    the compacted index (no double counting, first-day attribution
    intact)."""
    import pandas as pd

    from serene_spark.streaming.growth_stream import (
        compact_index,
        read_new_vs_returning,
        start_new_vs_returning,
    )

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    index_dir = str(tmp_path / "growth_index")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 2, 1, 10, 0, 0)

    def ev(eid, day, user):
        return (eid, t0 + datetime.timedelta(days=day), user, "click", 1.0, "{}")

    _write_events(events_dir / "a.parquet",
                  [ev(1, 0, 1), ev(2, 0, 2), ev(3, 1, 1)])
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)
    _write_events(events_dir / "b.parquet",
                  [ev(4, 2, 2), ev(5, 2, 3)])
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)

    rows_before = sorted(
        (r["user_id"], r["day"], r["is_first"])
        for r in spark.read.parquet(index_dir).collect()
    )
    view_before = read_new_vs_returning(spark, index_dir).toPandas()
    n_epochs = spark.read.parquet(index_dir).select("epoch").distinct().count()
    assert n_epochs >= 2

    assert compact_index(spark, index_dir) == n_epochs
    post = spark.read.parquet(index_dir)
    assert post.select("epoch").distinct().count() == 1
    assert sorted(
        (r["user_id"], r["day"], r["is_first"]) for r in post.collect()
    ) == rows_before
    pd.testing.assert_frame_equal(
        read_new_vs_returning(spark, index_dir).toPandas(), view_before
    )
    assert compact_index(spark, index_dir) == 0

    # post-compaction drop: user 1 returns (day 3, NOT first), user 4 new,
    # and a replayed (user 2, day 2) pair must not double count
    _write_events(events_dir / "c.parquet",
                  [ev(6, 3, 1), ev(7, 3, 4), ev(8, 2, 2)])
    q = start_new_vs_returning(spark, str(events_dir), index_dir, ckpt)
    assert q.awaitTermination(300)
    out = {r["day_bucket"]: r
           for r in read_new_vs_returning(spark, index_dir).collect()}
    d0 = min(out)
    assert out[d0 + 2]["active_users"] == 2       # replay not doubled
    assert out[d0 + 3]["new_users"] == 1          # user 4 only
    assert out[d0 + 3]["returning_users"] == 1    # user 1
    idx = spark.read.parquet(index_dir)
    pairs = [(r["user_id"], r["day"]) for r in idx.collect()]
    assert len(pairs) == len(set(pairs))          # still unique on (user, day)
