"""Document deduplication operators (scale extension; BASELINE.json north star).

The reference has no dedup surface; these are the training-data-pipeline
operators mandated for the rebuild, designed Spark-first:

- exact dedup        — hash-groupBy, one shuffle;
- n-gram Jaccard     — shingle -> self-join on shingle -> count ratio (the
                       exact quadratic baseline; LSH below is the scale path);
- MinHash + LSH      — shingle -> 16 min-hashes -> band buckets -> bucket join,
                       so candidate generation never goes quadratic;
- SimHash            — per-token hash bit-voting -> 16-bit signature ->
                       hamming-distance pairs.

Portability: all hashing is built on ``md5`` strings (identical on both
engines); a min over md5 strings is a uniform-permutation proxy, which makes
the MinHash signature itself oracle-checkable — no engine-specific hash().

Scale notes (100 TB): every stage is a narrow projection or a keyed
aggregation/join; the shingle self-join of the exact variant is the only
quadratic-risk op (kept for small corpora / verification; LSH is the
production path). Band buckets with huge collision groups would be salted or
capped in production; the skeleton keeps keys uniform by construction (md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serene_spark.catalog import register_views
from serene_spark.functions.sqlgen import (
    DUCKDB,
    SPARK,
    agg_ordered,
    bxor,
    explode_seq,
    idiv,
    rr,
    split_re,
)
from serene_spark.registry import register

SHINGLE_K = 8          # char-shingle width
N_MINHASH = 16         # minhash permutations
BAND_SIZE = 2          # rows per LSH band -> 8 bands (tuned to surface
                       # candidates on the synthetic corpus; production would
                       # use wider bands for higher thresholds)


_WS_PAT = "[ \t\n\r]+"


def norm_expr(dialect: str, col: str = "text") -> str:
    """lowercase, collapse whitespace, trim."""
    collapsed = rr(dialect, f"lower({col})", _WS_PAT, " ")
    return f"trim({collapsed})"


def shingles_rel(dialect: str) -> str:
    """Distinct char-K-shingles per document."""
    n = norm_expr(dialect)
    return f"""
norm AS (
  SELECT doc_id, {n} AS norm FROM documents
),
pos AS (
  SELECT doc_id, norm, {explode_seq(dialect, 1, f'greatest(1, length(norm) - {SHINGLE_K} + 1)')} AS i
  FROM norm
),
shingles AS (
  SELECT DISTINCT doc_id, substr(norm, i, {SHINGLE_K}) AS sh FROM pos
)"""


def dedup_exact_sql(dialect: str) -> str:
    return f"""
WITH hashed AS (
  SELECT doc_id, md5({norm_expr(dialect)}) AS text_hash FROM documents
)
SELECT text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM hashed GROUP BY text_hash
"""


def ngram_jaccard_sql(dialect: str, threshold: float = 0.2) -> str:
    return f"""
WITH {shingles_rel(dialect)},
counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM shingles GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS c
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT common.d1 AS doc_id_1, common.d2 AS doc_id_2,
       round(CAST(c AS DOUBLE) / (n1.n_sh + n2.n_sh - c), 6) AS jaccard
FROM common
JOIN counts n1 ON common.d1 = n1.doc_id
JOIN counts n2 ON common.d2 = n2.doc_id
WHERE CAST(c AS DOUBLE) / (n1.n_sh + n2.n_sh - c) >= {threshold}
"""


def minhash_rel(dialect: str) -> str:
    """16 min-hashes per doc: permutation i = min over shingles of
    md5(i || '|' || shingle); min over md5 hex strings is a uniform proxy."""
    return f"""
{shingles_rel(dialect)},
seeded AS (
  SELECT doc_id, sh, {explode_seq(dialect, 0, N_MINHASH - 1)} AS seed FROM shingles
),
mh AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS STRING) || '|' || sh)) AS mh
  FROM seeded GROUP BY doc_id, seed
)"""


def minhash_signatures_sql(dialect: str) -> str:
    return f"WITH {minhash_rel(dialect)} SELECT doc_id, CAST(seed AS BIGINT) AS seed, mh FROM mh"


def minhash_lsh_sql(dialect: str) -> str:
    band = idiv(dialect, "seed", BAND_SIZE)
    sig = agg_ordered(dialect, "mh", "seed", "|")
    return f"""
WITH {minhash_rel(dialect)},
bands AS (
  SELECT doc_id, {band} AS band, md5({sig}) AS sig
  FROM mh GROUP BY doc_id, {band}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
est AS (
  SELECT cand.d1, cand.d2,
         CAST(SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM cand
  JOIN mh m1 ON m1.doc_id = cand.d1
  JOIN mh m2 ON m2.doc_id = cand.d2 AND m2.seed = m1.seed
  GROUP BY cand.d1, cand.d2
)
SELECT d1 AS doc_id_1, d2 AS doc_id_2,
       round(CAST(n_match AS DOUBLE) / {N_MINHASH}, 6) AS est_jaccard
FROM est
"""


def simhash_rel(dialect: str) -> str:
    """16-bit SimHash: for hex position p of md5(token), vote +1/-1 by whether
    the digit is >= 8; bit p set if the vote sum is positive."""
    toks = split_re(dialect, norm_expr(dialect), "[^a-z0-9]+")
    from serene_spark.functions.sqlgen import explode as _explode

    return f"""
tokens AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, {_explode(dialect, toks)} AS tok FROM documents
  ) t WHERE tok <> ''
),
votes AS (
  SELECT doc_id, p,
         SUM(CASE WHEN instr('0123456789abcdef', substr(md5(tok), p, 1)) - 1 >= 8
                  THEN 1 ELSE -1 END) AS v
  FROM (SELECT doc_id, tok, {explode_seq(dialect, 1, '16')} AS p FROM tokens) s
  GROUP BY doc_id, p
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN CAST(pow(2, p - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)"""


def simhash_signatures_sql(dialect: str) -> str:
    return f"WITH {simhash_rel(dialect)} SELECT doc_id, simhash FROM sim"


def simhash_pairs_sql(dialect: str, max_hamming: int = 2) -> str:
    ham = f"bit_count({bxor(dialect, 'a.simhash', 'b.simhash')})"
    return f"""
WITH {simhash_rel(dialect)}
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST({ham} AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
"""


def _sql_query(sql_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("documents",), spread=True)
        return spark.sql(sql_fn(SPARK))

    return run


register("dedup_exact", oracle=dedup_exact_sql(DUCKDB),
         doc="exact dedup: normalized-text hash groups with keeper doc id")(_sql_query(dedup_exact_sql))
register("dedup_ngram_jaccard", oracle=ngram_jaccard_sql(DUCKDB),
         doc=f"char-{SHINGLE_K}-gram Jaccard near-dup pairs (exact quadratic baseline)")(_sql_query(ngram_jaccard_sql))
register("minhash_signatures", oracle=minhash_signatures_sql(DUCKDB),
         doc=f"{N_MINHASH}-permutation MinHash signatures (md5-min portable hashing)")(_sql_query(minhash_signatures_sql))
register("dedup_minhash_lsh", oracle=minhash_lsh_sql(DUCKDB),
         doc="MinHash LSH banded candidate pairs + estimated Jaccard (scale path)")(_sql_query(minhash_lsh_sql))
register("simhash_signatures", oracle=simhash_signatures_sql(DUCKDB),
         doc="16-bit SimHash signatures via md5-hex bit voting")(_sql_query(simhash_signatures_sql))
register("dedup_simhash_pairs", oracle=simhash_pairs_sql(DUCKDB),
         doc="SimHash near-dup pairs at hamming distance <= 2")(_sql_query(simhash_pairs_sql))
