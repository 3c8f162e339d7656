"""Class-balancing resampling operators (SURVEY §2.8).

Reference: ``ClassImbalanceResampler`` up/down-samples labeled *columns* per
class with a sequential ``scala.util.Random`` stream, seed 5123219
(matcher/.../train/ClassImbalanceResampler.scala:42-150, strategy dispatch
:394-416). A distributed engine cannot reproduce a sequential RNG stream, so
(documented divergence, SURVEY §7 risk 2) the rebuild's strategies are
**deterministic-cyclic**: upsampling emits row copies by cycling each class's
rows in key order until the target count is reached; downsampling keeps the
first ``target`` rows in key order. Deterministic across engines AND across
partitionings — strictly better for reproducibility than seeded RNG, and
fully oracle-checkable.

Strategies: UpsampleToMax / ResampleToMedian here as oracle queries over
``customer`` (class = c_mktsegment); the general library form (any df, any
label column, plus mean targets and bagging) lives in serene_spark/ml.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK, explode_seq, idiv
from serene_spark.registry import register


def upsample_to_max_sql(dialect: str) -> str:
    copies = idiv(dialect, "(t.target - n.rn)", "n.n")
    return f"""
WITH counts AS (
  SELECT c_mktsegment AS cls, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_mktsegment
),
tgt AS (SELECT MAX(n) AS target FROM counts),
numbered AS (
  SELECT c_custkey, c_mktsegment AS cls,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
  FROM customer
),
n AS (
  SELECT numbered.c_custkey, numbered.cls, numbered.rn, counts.n
  FROM numbered JOIN counts ON numbered.cls = counts.cls
)
SELECT c_custkey, cls, CAST(copy_idx AS BIGINT) AS copy_idx
FROM (
  SELECT n.c_custkey, n.cls, {explode_seq(dialect, 0, copies)} AS copy_idx
  FROM n CROSS JOIN tgt t
) x
"""


def downsample_to_median_sql(dialect: str) -> str:
    return f"""
WITH counts AS (
  SELECT c_mktsegment AS cls, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_mktsegment
),
ranked_counts AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn, COUNT(*) OVER () AS k FROM counts
),
tgt AS (
  SELECT n AS target FROM ranked_counts WHERE rn = CAST(ceil(k / 2.0) AS BIGINT)
),
numbered AS (
  SELECT c_custkey, c_mktsegment AS cls,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
  FROM customer
)
SELECT numbered.c_custkey, numbered.cls
FROM numbered CROSS JOIN tgt WHERE numbered.rn <= tgt.target
"""


NUM_BAGS = 10   # reference defaults are 100/100 (README bagging section;
BAG_SIZE = 20   # TrainMlib:303-304); kept small for the checkable query —
                # the SQL is size-independent.


def bagging_sql(dialect: str) -> str:
    """Bagging (ClassImbalanceResampler.scala:186-270): per column, NUM_BAGS
    bags of BAG_SIZE values sampled WITH replacement.

    Deterministic-hash variant of the reference's seeded RNG: the value for
    (column, bag, slot) is row number ``md5(column|bag|slot) % n`` of the
    column in key order — a pure function of (column, bag, slot, n), so
    reproducible on any engine and partitioning. Slots are generated with one
    ``explode(sequence(...))`` per column and resolved with a single
    (column, row-number) equi-join; per-bag profiling then reuses the §2.3
    aggregations with ``(column_name, bag)`` as the group key.
    """
    from serene_spark.functions.melt import melt_sql
    from serene_spark.catalog import COLUMNS
    from serene_spark.functions.sqlgen import hex_to_int

    long_rel = melt_sql("customer", COLUMNS["customer"]) if dialect == DUCKDB else "__serene_bag_long"
    pick = hex_to_int(
        dialect,
        "substr(md5(s.column_name || '|' || CAST(s.bag AS STRING) || '|' || CAST(s.slot AS STRING)), 1, 8)",
    )
    return f"""
WITH numbered AS (
  SELECT column_name, value,
         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY column_name) AS n
  FROM {long_rel} AS lr
),
slots AS (
  SELECT column_name, bag, {explode_seq(dialect, 1, str(BAG_SIZE))} AS slot
  FROM (
    SELECT DISTINCT column_name, {explode_seq(dialect, 1, str(NUM_BAGS))} AS bag
    FROM numbered
  ) b
),
counts AS (
  SELECT column_name, MAX(n) AS n FROM numbered GROUP BY column_name
),
chosen AS (
  SELECT s.column_name, s.bag, s.slot, ({pick} % c.n) + 1 AS rn
  FROM slots s JOIN counts c ON s.column_name = c.column_name
)
SELECT c.column_name, CAST(c.bag AS BIGINT) AS bag, CAST(c.slot AS BIGINT) AS slot, n.value
FROM chosen c
JOIN numbered n ON n.column_name = c.column_name AND n.rn = c.rn
"""


def _sql_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("customer",))
        return spark.sql(sql_fn(SPARK))

    return run


def _bagging_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serene_spark.catalog import load_table
    from serene_spark.functions.melt import melt

    melt(load_table(spark, sf_dir, "customer")).createOrReplaceTempView("__serene_bag_long")
    return spark.sql(bagging_sql(SPARK))


register("resample_upsample_max", oracle=upsample_to_max_sql(DUCKDB),
         doc="SURVEY §2.8 UpsampleToMax (deterministic-cyclic) on customer/mktsegment")(_sql_query(upsample_to_max_sql))
register("resample_downsample_median", oracle=downsample_to_median_sql(DUCKDB),
         doc="SURVEY §2.8 ResampleToMedian downsampling (deterministic key order)")(_sql_query(downsample_to_median_sql))
register("resample_bagging", oracle=bagging_sql(DUCKDB),
         doc="SURVEY §2.8 Bagging: per-column bags sampled with replacement (deterministic hash)")(_bagging_spark)
