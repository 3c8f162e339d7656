"""PageRank over the supplier co-purchase graph — the iterative-graph-
algorithm exemplar, expressed so the parity gate can check it EXACTLY:
a fixed number of power iterations unrolls into chained CTEs (Page et al.,
"The PageRank Citation Ranking", 1999; the SQL-unrolled form every
dataflow engine uses for bounded iteration).

Graph: suppliers are connected when they supply at least one common
customer (lineitem ⋈ orders → distinct (customer, supplier) → self-join on
customer).  Undirected; dangling (edge-less) suppliers keep the teleport
mass (no dangling redistribution — fixed formula, both engines identical).

Numeric determinism: ranks live in DECIMAL(18,9) — every neighbor
contribution is computed in IEEE double (bit-identical across engines for
identical inputs), rounded to 9 dp, and summed exactly, so
partial-aggregation order cannot move the result (engine convention).

Scale shape (100 TB): the edge list is materialized ONCE Spark-side
(localCheckpoint; each iteration re-reads it, and Catalyst would otherwise
inline the whole lineitem ⋈ orders pipeline into every iteration).  Each
iteration is one shuffle keyed on the destination node — the standard
Pregel-on-dataflow layout; iterations are a linear CTE chain, each
consumed exactly once.  The co-purchase self-join is bounded per customer
(suppliers-per-customer is small and capped by order size, never N²
global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.registry import register

DAMPING = "0.85"
N_ITER = 3


def edges_sql(dialect: str) -> str:
    """Undirected co-purchase edges (both directions) + per-node out-degree."""
    return """
cs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT DISTINCT a.s AS src, b.s AS dst
  FROM cs a JOIN cs b ON a.c = b.c AND a.s <> b.s
)"""


def _iter_cte(prev: str, cur: str) -> str:
    """One power iteration: rank flows src->dst along edges; nodes without
    in-edges keep the teleport term (LEFT JOIN)."""
    return f"""
{cur} AS (
  SELECT n.node,
         CAST(ROUND((1 - {DAMPING}) / (SELECT cnt FROM nn)
                    + COALESCE(f.contrib, 0), 9) AS DECIMAL(18,9)) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND({DAMPING} * CAST(p.rank AS DOUBLE) / p.outdeg, 9)
                    AS DECIMAL(18,9))) AS contrib
    FROM edges e
    JOIN (SELECT r.node, r.rank, d.outdeg
          FROM {prev} r JOIN degs d ON r.node = d.node) p
      ON e.src = p.node
    GROUP BY e.dst
  ) f ON n.node = f.node
)"""


def pagerank_tail_sql(edges_rel: str, head: str = "WITH ") -> str:
    """Iteration chain + final projection over ``nodes`` and a named edges
    relation.  The ONLY formulation of the algorithm — both the Spark
    runner (materialized views) and the oracle (head-spliced CTEs) call
    this, so the two paths cannot desynchronize."""
    iters = "".join(
        "," + _iter_cte(f"r{i}" if i else "r0", f"r{i + 1}")
        for i in range(N_ITER)
    )
    return f"""
{head}nn AS (SELECT COUNT(*) AS cnt FROM nodes),
degs AS (
  SELECT src AS node, COUNT(*) AS outdeg FROM {edges_rel} GROUP BY src
),
r0 AS (
  SELECT node, CAST(ROUND(1.0 / (SELECT cnt FROM nn), 9) AS DECIMAL(18,9)) AS rank
  FROM nodes
){iters}
SELECT n.node AS s_suppkey,
       CAST(COALESCE(d.outdeg, 0) AS BIGINT) AS degree,
       ROUND(CAST(r.rank AS DOUBLE), 6) AS pagerank
FROM nodes n
JOIN r{N_ITER} r ON n.node = r.node
LEFT JOIN degs d ON n.node = d.node
"""


def pagerank_sql(dialect: str) -> str:
    return (
        f"WITH {edges_sql(dialect)},\n"
        "nodes AS (\n  SELECT s_suppkey AS node FROM supplier\n),"
        + pagerank_tail_sql("edges", head="")
    )


def _pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "orders", "supplier"))
    edges = spark.sql(
        f"WITH {edges_sql(SPARK)} SELECT * FROM edges"
    ).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("edges")
    spark.sql("SELECT s_suppkey AS node FROM supplier").localCheckpoint(
        eager=True
    ).createOrReplaceTempView("nodes")
    # degs is small but referenced per iteration; it derives from the
    # materialized edges view so each reference is one tiny agg
    return spark.sql(pagerank_tail_sql("edges"))


register(
    "pagerank_suppliers",
    oracle=pagerank_sql(DUCKDB),
    doc=f"PageRank ({N_ITER} unrolled power iterations, damping {DAMPING}) "
    "over the supplier co-purchase graph; decimal-exact rank sums",
)(_pagerank)
