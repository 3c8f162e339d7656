"""Entity resolution (record linkage): match records that refer to the same
real-world entity across two differently-formatted sources, without a shared
key — the blocking → pairwise-scoring → best-match-selection pipeline
(Fellegi & Sunter 1969; Christen, "Data Matching", 2012).

The dirty source is derived IN-QUERY from customer by deterministic,
dialect-shared reformatting (documented constructed fixture, same pattern as
``pii_scan_customer``): names lose their zero-padded id format
(``Customer#000000123`` → ``cust 123``), balances round to whole units,
segments lowercase.  Ground truth is therefore known, which lets the tests
measure precision/recall of the *scoring*, not just run the plumbing.

Pipeline (one statement):

1. **Blocking** — candidate pairs only within ``(nation, id-digits mod 100)``
   blocks; never the all-pairs cross join.  At 100 TB blocking is THE scale
   lever: candidates = Σ block² instead of N², and the block join is a plain
   equi-join shuffle keyed on the block key.
2. **Scoring** — weighted field agreement: Jaro similarity of the
   reformatted names (Arrow-batched pandas UDF Spark-side; DuckDB's
   built-in ``jaro_similarity`` oracle-side — same formulation, pinned by
   ``pair_jaro_customer``), balance closeness ``1/(1+|Δ|)``, exact segment
   match.
3. **Selection** — rank-1 per dirty record on the ROUNDED score with an id
   tie-break, accepted above ``MATCH_THRESHOLD``.

Oracle-exact: ``er_match_customer`` (the full pipeline) and
``er_blocking_stats`` (candidate-generation audit: block sizes and the
candidate:all-pairs reduction ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import DUCKDB, SPARK
from serene_spark.registry import register

# Accept threshold sits mid-margin between the score populations measured on
# the sf0.01 fixture: true-pair scores >= 0.677, best false-pair score 0.561
# (perfect separation; rank-1 is the true match for every record).
MATCH_THRESHOLD = 0.62
W_NAME, W_BAL, W_SEG = 0.5, 0.3, 0.2
BLOCK_MOD = 100


def _digits(dialect: str, expr: str) -> str:
    """Customer id digits without leading zeros, e.g. '000000123' -> '123'
    ('' for customer 0 -> normalize to '0')."""
    raw = f"regexp_extract({expr}, '([0-9]+)$', 1)"  # same text both dialects
    t = f"trim(LEADING '0' FROM {raw})"
    return f"CASE WHEN {t} = '' THEN '0' ELSE {t} END"


def dirty_rel(dialect: str) -> str:
    """The second source: reformatted customer records (deterministic,
    engine-shared string/number ops only)."""
    d = _digits(dialect, "c_name")
    return f"""
dirty AS (
  SELECT c_custkey AS dirty_id,
         'cust ' || {d} AS d_name,
         ROUND(c_acctbal, 0) AS d_bal,
         lower(c_mktsegment) AS d_seg,
         c_nationkey AS d_nation,
         CAST({d} AS BIGINT) % {BLOCK_MOD} AS d_block
  FROM customer
)"""


def clean_rel(dialect: str) -> str:
    d = _digits(dialect, "c_name")
    return f"""
clean AS (
  SELECT c_custkey,
         lower(c_name) AS c_name_norm,
         c_acctbal,
         lower(c_mktsegment) AS c_seg,
         c_nationkey,
         CAST({d} AS BIGINT) % {BLOCK_MOD} AS c_block
  FROM customer
)"""


def _pairs_sql(dialect: str, jaro: str) -> str:
    """Blocked candidate pairs with the weighted match score.

    ``jaro`` is the dialect's Jaro expression over (d_name, c_name_norm).
    """
    return f"""
WITH {dirty_rel(dialect)},
{clean_rel(dialect)},
pairs AS (
  SELECT d.dirty_id, c.c_custkey,
         ROUND({W_NAME} * {jaro}
             + {W_BAL} * (1.0 / (1.0 + abs(d.d_bal - c.c_acctbal)))
             + {W_SEG} * (CASE WHEN d.d_seg = c.c_seg THEN 1.0 ELSE 0.0 END),
           6) AS score
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nationkey AND d.d_block = c.c_block
)"""


def er_match_sql(dialect: str) -> str:
    jaro = (
        "jaro_similarity(d.d_name, c.c_name_norm)"
        if dialect == DUCKDB
        else "__er_jaro(d.d_name, c.c_name_norm)"
    )
    return f"""
{_pairs_sql(dialect, jaro)},
ranked AS (
  SELECT dirty_id, c_custkey, score,
         ROW_NUMBER() OVER (PARTITION BY dirty_id
                            ORDER BY score DESC, c_custkey) AS rk
  FROM pairs
)
SELECT dirty_id, c_custkey AS matched_custkey, score
FROM ranked
WHERE rk = 1 AND score >= {MATCH_THRESHOLD}
"""


def er_blocking_stats_sql(dialect: str) -> str:
    """Candidate-generation audit: per-block candidate-pair counts — the
    relation a linkage engineer sums to check the reduction vs the N² cross
    join before paying for scoring (the test derives that ratio)."""
    return f"""
WITH {dirty_rel(dialect)},
{clean_rel(dialect)},
block_sizes AS (
  SELECT d.d_nation AS nation, d.d_block AS block_key,
         COUNT(*) AS n_candidates
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nationkey AND d.d_block = c.c_block
  GROUP BY 1, 2
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(block_key AS BIGINT) AS block_key,
       CAST(n_candidates AS BIGINT) AS n_candidates
FROM block_sizes
"""


def _er_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from serene_spark.operators.pair_features import _jaro

    register_views(spark, sf_dir, ("customer",))
    jaro_udf = pandas_udf(
        lambda a, b: pd.Series([_jaro(x, y) for x, y in zip(a, b)]),
        DoubleType(),
    )
    spark.udf.register("__er_jaro", jaro_udf)
    return spark.sql(er_match_sql(SPARK))


def _er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(er_blocking_stats_sql(SPARK))


register(
    "er_match_customer",
    oracle=er_match_sql(DUCKDB),
    doc="entity resolution: blocked candidate pairs, weighted Jaro/balance/"
    "segment scoring, rank-1-above-threshold match selection",
)(_er_match)

register(
    "er_blocking_stats",
    oracle=er_blocking_stats_sql(DUCKDB),
    doc="record-linkage blocking audit: per-block candidate counts "
    "(the N² -> Σ block² reduction)",
)(_er_blocking)


# --- Fellegi-Sunter probabilistic linkage ------------------------------------

FS_NAME_T = 0.85  # Jaro agreement threshold for the name comparison
FS_BAL_T = 1.0    # absolute balance difference for agreement


def er_fellegi_sunter_sql(dialect: str) -> str:
    """The Fellegi-Sunter decision model (JASA 1969) over the SAME blocked
    candidate pairs as ``er_match_customer``: each pair reduces to a
    comparison vector γ = (name, balance, segment agreement flags); the
    per-field m = P(γ_k=1 | match) and u = P(γ_k=1 | non-match)
    probabilities are estimated as EXACT integer ratios against the
    fixture's known truth (dirty_id = custkey — the constructed-fixture
    convention that lets the model's quality be measured, not assumed);
    each of the 8 patterns gets its composite log2 likelihood weight
    Σ log2(m/u) or log2((1−m)/(1−u)) and its EMPIRICAL match probability
    emitted beside it — the weight table IS the linkage decision surface
    (upper/lower thresholds are picked off it).  Degenerate arms (a field
    that never/always agrees in one class) yield NULL weight — stated,
    not silent.

    Scale: the gamma relation is the blocked candidate set (Σ block², never
    N²); everything downstream is an 8-row pattern table."""
    jaro = (
        "jaro_similarity(d.d_name, c.c_name_norm)"
        if dialect == DUCKDB
        else "__er_jaro(d.d_name, c.c_name_norm)"
    )
    return f"""
WITH {dirty_rel(dialect)},
{clean_rel(dialect)},
gamma AS (
  SELECT CASE WHEN {jaro} >= {FS_NAME_T} THEN 1 ELSE 0 END AS g_name,
         CASE WHEN abs(d.d_bal - c.c_acctbal) <= {FS_BAL_T} THEN 1 ELSE 0 END
           AS g_bal,
         CASE WHEN d.d_seg = c.c_seg THEN 1 ELSE 0 END AS g_seg,
         CASE WHEN d.dirty_id = c.c_custkey THEN 1 ELSE 0 END AS is_match
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nationkey AND d.d_block = c.c_block
),
mu AS (
  SELECT SUM(is_match) AS n_m, SUM(1 - is_match) AS n_u,
         SUM(g_name * is_match) AS a_name_m, SUM(g_name * (1 - is_match)) AS a_name_u,
         SUM(g_bal * is_match) AS a_bal_m, SUM(g_bal * (1 - is_match)) AS a_bal_u,
         SUM(g_seg * is_match) AS a_seg_m, SUM(g_seg * (1 - is_match)) AS a_seg_u
  FROM gamma
),
patterns AS (
  SELECT g_name, g_bal, g_seg,
         SUM(is_match) AS n_match, SUM(1 - is_match) AS n_nonmatch
  FROM gamma GROUP BY g_name, g_bal, g_seg
),
weighted AS (
  SELECT p.g_name, p.g_bal, p.g_seg, p.n_match, p.n_nonmatch,
         -- per-field log2 likelihood ratios; NULL when an arm is degenerate
         (CASE WHEN p.g_name = 1 THEN
            CASE WHEN m.a_name_u > 0 AND m.a_name_m > 0 THEN
              log2((CAST(m.a_name_m AS DOUBLE) / m.n_m)
                     / (CAST(m.a_name_u AS DOUBLE) / m.n_u)) END
          ELSE
            CASE WHEN m.n_u > m.a_name_u AND m.n_m > m.a_name_m THEN
              log2((CAST(m.n_m - m.a_name_m AS DOUBLE) / m.n_m)
                     / (CAST(m.n_u - m.a_name_u AS DOUBLE) / m.n_u)) END
          END)
         + (CASE WHEN p.g_bal = 1 THEN
              CASE WHEN m.a_bal_u > 0 AND m.a_bal_m > 0 THEN
                log2((CAST(m.a_bal_m AS DOUBLE) / m.n_m)
                       / (CAST(m.a_bal_u AS DOUBLE) / m.n_u)) END
            ELSE
              CASE WHEN m.n_u > m.a_bal_u AND m.n_m > m.a_bal_m THEN
                log2((CAST(m.n_m - m.a_bal_m AS DOUBLE) / m.n_m)
                       / (CAST(m.n_u - m.a_bal_u AS DOUBLE) / m.n_u)) END
            END)
         + (CASE WHEN p.g_seg = 1 THEN
              CASE WHEN m.a_seg_u > 0 AND m.a_seg_m > 0 THEN
                log2((CAST(m.a_seg_m AS DOUBLE) / m.n_m)
                       / (CAST(m.a_seg_u AS DOUBLE) / m.n_u)) END
            ELSE
              CASE WHEN m.n_u > m.a_seg_u AND m.n_m > m.a_seg_m THEN
                log2((CAST(m.n_m - m.a_seg_m AS DOUBLE) / m.n_m)
                       / (CAST(m.n_u - m.a_seg_u AS DOUBLE) / m.n_u)) END
            END) AS fs_weight
  FROM patterns p JOIN mu m ON 1 = 1
)
SELECT CAST(g_name AS INT) AS g_name,
       CAST(g_bal AS INT) AS g_bal,
       CAST(g_seg AS INT) AS g_seg,
       CAST(n_match AS BIGINT) AS n_match,
       CAST(n_nonmatch AS BIGINT) AS n_nonmatch,
       ROUND(fs_weight, 6) AS fs_weight,
       ROUND(CAST(n_match AS DOUBLE) / (n_match + n_nonmatch), 6)
         AS p_match_empirical
FROM weighted
ORDER BY g_name DESC, g_bal DESC, g_seg DESC
"""


def _er_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from serene_spark.operators.pair_features import _jaro

    register_views(spark, sf_dir, ("customer",))
    jaro_udf = pandas_udf(
        lambda a, b: pd.Series([_jaro(x, y) for x, y in zip(a, b)]),
        DoubleType(),
    )
    spark.udf.register("__er_jaro", jaro_udf)
    return spark.sql(er_fellegi_sunter_sql(SPARK))


register(
    "er_fellegi_sunter",
    oracle=er_fellegi_sunter_sql(DUCKDB),
    doc="Fellegi-Sunter linkage decision table over the blocked candidate "
    "pairs: exact-ratio m/u estimates against the fixture truth, per-"
    "pattern composite log2 weights + empirical match probability; "
    "degenerate arms NULL",
)(_er_fs)


# --- Jaro-Winkler scoring + sorted-neighborhood blocking ---------------------

JW_PREFIX_MAX = 4
JW_SCALE = 0.1
JW_BOOST_THRESHOLD = 0.7
SN_WINDOW = 3


def er_jw_sql(dialect: str) -> str:
    """Jaro vs Jaro-Winkler over the blocked candidate pairs: the Winkler
    prefix boost is what separates same-entity name variants (shared
    prefixes) from coincidental transposition matches — emitting both
    scores makes the boost's effect measurable per pair.  Top 20 pairs by
    (ROUND(jw,6) DESC, ids)."""
    if dialect == DUCKDB:
        pair = ("SELECT d.dirty_id, c.c_custkey,\n"
                "         ROUND(jaro_similarity(d.d_name, c.c_name_norm), 6) AS jaro,\n"
                "         ROUND(jaro_winkler_similarity(d.d_name, c.c_name_norm), 6) AS jaro_winkler")
    else:
        # ONE Arrow UDF returns [jaro, jw]: the Winkler boost reuses the
        # quadratic Jaro base instead of recomputing it per pair
        pair = ("SELECT dirty_id, c_custkey,\n"
                "         ROUND(jj[0], 6) AS jaro, ROUND(jj[1], 6) AS jaro_winkler\n"
                "  FROM (SELECT d.dirty_id, c.c_custkey,\n"
                "               __er_jjw(d.d_name, c.c_name_norm) AS jj")
    tail = ("" if dialect == DUCKDB
            else ") inner_scored")
    return f"""
WITH {dirty_rel(dialect)},
{clean_rel(dialect)},
scored AS (
  {pair}
  FROM dirty d
  JOIN clean c ON d.d_nation = c.c_nationkey AND d.d_block = c.c_block
{tail})
SELECT dirty_id, c_custkey, jaro, jaro_winkler,
       ROUND(jaro_winkler - jaro, 6) AS winkler_boost
FROM scored
ORDER BY jaro_winkler DESC, dirty_id, c_custkey
LIMIT 20
"""


def _jaro_and_jw(a: str, b: str) -> list[float]:
    """Both scores from ONE quadratic Jaro computation."""
    from serene_spark.operators.pair_features import _jaro

    j = _jaro(a, b)
    if j <= JW_BOOST_THRESHOLD:
        return [j, j]
    p = 0
    for ca, cb in zip(a[:JW_PREFIX_MAX], b[:JW_PREFIX_MAX]):
        if ca != cb:
            break
        p += 1
    return [j, j + p * JW_SCALE * (1.0 - j)]


def _er_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    register_views(spark, sf_dir, ("customer",))
    spark.udf.register("__er_jjw", pandas_udf(
        lambda a, b: pd.Series([_jaro_and_jw(x, y) for x, y in zip(a, b)]),
        ArrayType(DoubleType())))
    return spark.sql(er_jw_sql(SPARK))


register(
    "er_jaro_winkler",
    oracle=er_jw_sql(DUCKDB),
    doc="Jaro vs Jaro-Winkler over the blocked ER candidate pairs (pandas-"
    "UDF Winkler boost vs DuckDB's jaro_winkler_similarity oracle); the "
    "per-pair boost column makes the prefix effect measurable",
)(_er_jw)


def er_sorted_neighborhood_sql(dialect: str) -> str:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995), the
    complement of hash blocking: union both sources, sort by the blocking
    KEY (normalized name), slide a window of {SN_WINDOW} — every
    cross-source pair within the window is a candidate.  The rank-distance
    join is an EQUI-join on rank buckets (bucket and bucket+1) with the
    |Δrank| filter — never a theta-join.  Emits candidate count, the
    fixture-truth matches found, recall, and the all-pairs reduction —
    directly comparable against er_blocking_stats' hash blocks."""
    return f"""
WITH {dirty_rel(dialect)},
{clean_rel(dialect)},
unioned AS (
  -- the SN sort key must CLUSTER matches: raw names sort the two sources
  -- into disjoint lexicographic regions ('cust 1...' vs 'customer#...'),
  -- so the key is the zero-padded shared id digits — the standard
  -- constructed-sort-key move (Christen 2012 ch.4: SN is only as good
  -- as its key)
  SELECT dirty_id AS rec_id, 'd' AS role,
         lpad(regexp_extract(d_name, '([0-9]+)$', 1), 12, '0') AS key_name
  FROM dirty
  UNION ALL
  SELECT c_custkey, 'c',
         lpad(regexp_extract(c_name_norm, '([0-9]+)$', 1), 12, '0')
  FROM clean
),
ranked AS (
  SELECT rec_id, role, key_name,
         ROW_NUMBER() OVER (ORDER BY key_name, role, rec_id) AS rk
  FROM unioned
),
bucketed AS (
  SELECT rec_id, role, rk, CAST(FLOOR((rk - 1.0) / {SN_WINDOW}) AS BIGINT) AS b
  FROM ranked
),
-- each dirty record PROBES its own bucket and BOTH neighbors (the
-- geo_grid_pairs shape): a window-mate can sit in bucket b-1, b or b+1
-- (the old OR-of-two-equalities join missed b-1 - measured 7/10 true
-- pairs found - and planned as a nested loop besides); the single-key
-- equality lets both engines hash-join
probes AS (
  SELECT rec_id, rk, b + off AS b
  FROM bucketed
  CROSS JOIN (SELECT -1 AS off UNION ALL SELECT 0 UNION ALL SELECT 1) o
  WHERE role = 'd'
),
cand AS (
  SELECT DISTINCT a.rec_id AS dirty_id, x.rec_id AS c_custkey
  FROM probes a
  JOIN bucketed x
    ON x.b = a.b AND x.role = 'c'
   AND ABS(x.rk - a.rk) <= {SN_WINDOW}
),
stats AS (
  SELECT COUNT(*) AS n_cand,
         SUM(CASE WHEN dirty_id = c_custkey THEN 1 ELSE 0 END) AS n_true
  FROM cand
),
tot AS (SELECT COUNT(*) AS n FROM dirty)
SELECT CAST(s.n_cand AS BIGINT) AS n_candidates,
       CAST(s.n_true AS BIGINT) AS true_matches_found,
       ROUND(CAST(s.n_true AS DOUBLE) / t.n, 6) AS recall,
       ROUND(CAST(s.n_cand AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n), 6)
         AS candidate_fraction_of_all_pairs
FROM stats s JOIN tot t ON 1 = 1
"""


register(
    "er_sorted_neighborhood",
    oracle=er_sorted_neighborhood_sql(DUCKDB),
    doc=f"Sorted-neighborhood blocking (window {SN_WINDOW}) over the union "
    "of both ER sources: rank-bucket EQUI-join candidates, fixture-truth "
    "recall and the all-pairs reduction emitted beside er_blocking_stats' "
    "hash blocks",
)(lambda spark, sf_dir: (
    register_views(spark, sf_dir, ("customer",)),
    spark.sql(er_sorted_neighborhood_sql(SPARK)),
)[1])
