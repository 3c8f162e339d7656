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
    bxor,
    explode_seq,
    hex_to_int,
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


# Prime > 2^32 for the double-hashing permutation family h_i = (h1 + i*h2) % P
# (Broder-style minhash with two base hashes; no per-permutation md5).
MH_PRIME = 4294967311


def minhash_rel(dialect: str) -> str:
    """16 min-hashes per doc as ONE wide aggregation.

    One md5 per shingle, split into two 32-bit ints (h1, h2); permutation i
    is (h1 + i*h2) % P — so the whole signature is a single
    ``groupBy(doc_id)`` with 16 MIN aggregates. No 16x row blowup, no
    per-permutation hashing; partial aggregation (map-side combine) applies
    to every MIN, so the shuffle carries 16 longs per doc, not per shingle.
    """
    h1 = hex_to_int(dialect, "substr(md5(sh), 1, 8)")
    h2 = hex_to_int(dialect, "substr(md5(sh), 9, 8)")
    mins = ",\n         ".join(
        f"MIN((h1 + {i} * h2) % {MH_PRIME}) AS mh{i}" for i in range(N_MINHASH)
    )
    return f"""
{shingles_rel(dialect)},
hashes AS (
  SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM shingles
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM hashes GROUP BY doc_id
)"""


def minhash_signatures_sql(dialect: str) -> str:
    cols = ", ".join(f"CAST(mh{i} AS BIGINT) AS mh{i}" for i in range(N_MINHASH))
    return f"WITH {minhash_rel(dialect)} SELECT doc_id, {cols} FROM mh"


def minhash_lsh_sql(dialect: str) -> str:
    n_bands = N_MINHASH // BAND_SIZE
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * BAND_SIZE + j} AS STRING)" for j in range(BAND_SIZE)
        )
        + ") AS sig FROM mh"
        for b in range(n_bands)
    )
    n_match = " + ".join(
        f"CASE WHEN m1.mh{i} = m2.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
WITH {minhash_rel(dialect)},
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT cand.d1 AS doc_id_1, cand.d2 AS doc_id_2,
       round(CAST(({n_match}) AS DOUBLE) / {N_MINHASH}, 6) AS est_jaccard
FROM cand
JOIN mh m1 ON m1.doc_id = cand.d1
JOIN mh m2 ON m2.doc_id = cand.d2
"""


def simhash_rel(dialect: str) -> str:
    """16-bit SimHash: for hex position p of md5(token), vote +1/-1 by whether
    the digit is >= 8; bit p set if the vote sum is positive.

    One md5 per token and ONE wide ``groupBy(doc_id)`` with 16 vote-sum
    aggregates — no 16x row explode, map-side combine on every SUM.
    """
    toks = split_re(dialect, norm_expr(dialect), "[^a-z0-9]+")
    from serene_spark.functions.sqlgen import explode as _explode

    votes = ",\n         ".join(
        f"SUM(CASE WHEN instr('0123456789abcdef', substr(h, {p}, 1)) - 1 >= 8"
        f" THEN 1 ELSE -1 END) AS v{p}"
        for p in range(1, 17)
    )
    bits = " + ".join(f"(CASE WHEN v{p} > 0 THEN {1 << (p - 1)} ELSE 0 END)" for p in range(1, 17))
    return f"""
tokens AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, {_explode(dialect, toks)} AS tok FROM documents
  ) t WHERE tok <> ''
),
hashed AS (
  SELECT doc_id, md5(tok) AS h FROM tokens
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
),
sim AS (
  SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
)"""


def simhash_signatures_sql(dialect: str) -> str:
    return f"WITH {simhash_rel(dialect)} SELECT doc_id, simhash FROM sim"


def simhash_pairs_sql(dialect: str, max_hamming: int = 2) -> str:
    """Near-dup pairs at hamming distance <= 2 over the 16-bit signature.

    Candidate generation is pigeonhole-chunked, not quadratic: split the
    signature into max_hamming+1 = 3 chunks (6/5/5 bits); two signatures
    within hamming 2 must agree exactly on at least one chunk, so an
    equi-join on (chunk_idx, chunk_value) finds every true pair while the
    join keys stay low-cardinality-bounded. The exact hamming filter then
    removes false candidates. Same output as the naive self-join.
    """
    chunk_exprs = (
        "(simhash % 64)",              # bits 1-6
        "((simhash // 64) % 32)" if dialect == DUCKDB else "((simhash div 64) % 32)",
        "(simhash // 2048)" if dialect == DUCKDB else "(simhash div 2048)",
    )
    chunks = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS ci, {e} AS cv FROM sim"
        for i, e in enumerate(chunk_exprs)
    )
    return f"""
WITH {simhash_rel(dialect)},
chunks AS ({chunks}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, a.simhash AS s1, b.doc_id AS d2, b.simhash AS s2
  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT a.d1 AS doc_id_1, a.d2 AS doc_id_2,
       CAST(bit_count({bxor(dialect, 'a.s1', 'a.s2')}) AS BIGINT) AS hamming
FROM cand a
WHERE bit_count({bxor(dialect, 'a.s1', 'a.s2')}) <= {max_hamming}
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
