"""Plan audits for the 100 TB layout primitives: bucketed co-located joins,
date-partition pruning, and salted two-phase aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from serene_spark.catalog import load_table
from serene_spark.plans.explain_audit import plan_text


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    from serene_spark.sources.layout import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, path=str(tmp_path / "ob"))
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "lb"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        txt = plan_text(joined)
        assert "SortMergeJoin" in txt
        assert "Exchange" not in txt, "bucketed join must not shuffle either side"

        n = joined.count()
        assert n == lineitem.count()  # every lineitem has an order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_date_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from serene_spark.sources.layout import write_date_partitioned

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_date")
    write_date_partitioned(events, out)

    back = spark.read.parquet(out)
    one_day = back.select(F.min(F.col("event_date"))).first()[0]
    q = back.where(F.col("event_date") == F.lit(one_day))
    txt = plan_text(q)
    assert "PartitionFilters" in txt and "event_date" in txt.split("PartitionFilters", 1)[1].split("]", 1)[0]

    want = events.where(F.to_date("ts") == F.lit(one_day)).count()
    assert q.count() == want and want > 0


def test_salted_agg_equals_plain(spark, sf_dir):
    from serene_spark.sources.layout import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 6), r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": "count:l_orderkey", "qty": "sum:l_quantity", "mx": "max:l_extendedprice"},
        ).collect()
    }
    want = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 6), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_orderkey").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == want and len(got) >= 2


def test_salted_agg_spreads_duplicate_rows(spark, sf_dir):
    """Exact-duplicate rows (the classic skew source) must land in multiple
    salt buckets — a row-content hash would put them all in one."""
    from pyspark.sql import functions as F

    from serene_spark.sources.layout import salted_agg

    one = load_table(spark, sf_dir, "nation").limit(1)
    dups = one
    for _ in range(5):
        dups = dups.union(one)  # 6 identical rows
    partial_groups = (
        dups.withColumn("__serene_salt", F.pmod(F.monotonically_increasing_id(), F.lit(4)))
        .select("__serene_salt")
        .distinct()
        .count()
    )
    assert partial_groups >= 2

    got = salted_agg(dups, ["n_name"], {"n": "count:n_nationkey"}, n_salt=4).collect()
    assert len(got) == 1 and got[0]["n"] == 6


def test_salted_agg_two_phase_plan(spark, sf_dir):
    from serene_spark.sources.layout import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    df = salted_agg(li, ["l_returnflag"], {"n": "count:l_orderkey"}, n_salt=8)
    txt = plan_text(df)
    # phase-1 shuffle carries the salt, phase-2 only the key
    assert "__serene_salt" in txt
    assert txt.count("Exchange") >= 2


def test_bucketed_fp_index_anti_join_shuffles_only_batch_side(spark, sf_dir, tmp_path):
    """The cluster-scale claim in streaming/incremental_dedup.py and
    growth_stream.py, made checkable: a per-batch anti-join against an
    index BUCKETED on the join key plans with NO Exchange on the index
    side — only the (small) incoming batch shuffles — and produces the
    same survivors as the plain-parquet anti-join."""
    from serene_spark.sources.layout import write_bucketed
    from serene_spark.streaming.incremental_dedup import _fp_expr

    docs = load_table(spark, sf_dir, "documents")
    index = docs.limit(400).selectExpr(
        f"{_fp_expr()} AS fp", "doc_id", "source"
    ).groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    write_bucketed(index, "fp_index_b", ["fp"], 8,
                   path=str(tmp_path / "fpb"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = docs.selectExpr(f"{_fp_expr()} AS fp", "doc_id")
        fresh = batch.join(spark.table("fp_index_b"), "fp", "left_anti")
        txt = plan_text(fresh)
        assert "SortMergeJoin" in txt and "LeftAnti" in txt
        # exactly ONE shuffle in the whole plan...
        tree = txt.split("\n\n", 1)[0]  # the numbered operator tree
        exchanges = [ln for ln in tree.splitlines() if "Exchange" in ln]
        assert len(exchanges) == 1, tree
        # ...and it sits in the BATCH subtree (printed first under the
        # join), not above the bucketed index scan: in the tree, the
        # index scan follows the last Sort with no Exchange between
        idx_part = tree[tree.rindex("Sort"):]
        assert "fp_index_b" in idx_part and "Exchange" not in idx_part, tree

        # value equality vs the plain-parquet anti-join
        plain = batch.join(
            index.select("fp"), "fp", "left_anti"
        )
        assert sorted(r["doc_id"] for r in fresh.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS fp_index_b")
