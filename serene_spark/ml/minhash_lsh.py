"""Built-in Spark ML MinHashLSH as an alternative dedup candidate path.

The engine's primary near-dup pipeline is the SQL-generated MinHash + banded
LSH + exact-Jaccard verify (operators/dedup.py) — oracle-checked and
dialect-shared. This module is the `pyspark.ml.feature.MinHashLSH`
re-expression of the same candidate generation, provided because a cluster
team may prefer the built-in operator's `approxSimilarityJoin` (Catalyst-
planned hash-join on LSH keys, same scale shape as the custom banded join).

Recall vs the exact shingle-Jaccard pairs is pinned in
tests/test_ml_minhash.py; the operator is registered rows-only (hashing
internals are not SQL-expressible for a DuckDB oracle).

Reference note: the reference has no dedup operators at all (SURVEY §2.12);
both paths are scale extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serene_spark.catalog import load_table
from serene_spark.operators.dedup import SHINGLE_K
from serene_spark.registry import register

N_HASH_TABLES = 8
NUM_FEATURES = 1 << 18
LSH_SEED = 5043  # the reference RF seed, reused for determinism


def shingle_vectors(docs: DataFrame) -> DataFrame:
    """Distinct char-K-shingles per doc -> sparse binary HashingTF vectors.

    Normalization comes from the SQL path's ``norm_expr`` (one definition —
    a change to the shared normalization cannot desynchronize the two LSH
    paths); empty shingles (empty/whitespace-only docs) are filtered so such
    docs don't pair up as spurious perfect duplicates.
    """
    from pyspark.ml.feature import HashingTF

    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.operators.dedup import norm_expr

    norm = docs.selectExpr("doc_id", f"{norm_expr(SPARK)} AS norm")
    shingled = norm.select(
        "doc_id",
        F.expr(
            f"filter(array_distinct(transform("
            f"sequence(1, greatest(1, length(norm) - {SHINGLE_K} + 1)),"
            f" i -> substr(norm, i, {SHINGLE_K}))), x -> x <> '')"
        ).alias("shingles"),
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=NUM_FEATURES, binary=True
    )
    return tf.transform(shingled)


def approx_near_dup_pairs(
    spark: SparkSession, docs: DataFrame, jaccard_threshold: float = 0.2
) -> DataFrame:
    """Candidate near-dup pairs via MinHashLSH.approxSimilarityJoin.

    `distCol` is the ML estimator's Jaccard DISTANCE over the hashed feature
    sets. approxSimilarityJoin keeps pairs at STRICT dist < threshold, so the
    cutoff gets an epsilon bump to make similarity == jaccard_threshold
    inclusive — matching the SQL path's `>=` semantics (modulo HashingTF
    collisions — the exact verify in dedup_lsh_verified is the production
    answer to that).
    """
    from pyspark.ml.feature import MinHashLSH

    from serene_spark.materialize import materialize

    # vecs is referenced three times (fit + both sides of the self-join);
    # Catalyst inlines the shingling + HashingTF lineage at every reference,
    # so without a barrier the normalization/shingle/TF pass runs 3x per
    # query (measured r13: 8.6-14.2 s -> 5.0-6.2 s at sf0.01 with the
    # barrier, pairs identical). At corpus scale the tripled pass is
    # data-scale work, not just scheduling.
    vecs = materialize(shingle_vectors(docs).where(F.expr("size(shingles) > 0")))
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=N_HASH_TABLES,
        seed=LSH_SEED,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - jaccard_threshold + 1e-9, distCol="jaccard_dist"
    )
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id_1"),
            F.col("datasetB.doc_id").alias("doc_id_2"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
    )


@register(
    "dedup_ml_minhash",
    oracle=None,  # ML hashing — rows-only; recall pinned in tests
    doc="built-in MinHashLSH approxSimilarityJoin near-dup candidates "
    "(alternative to the SQL banded-LSH path)",
)
def dedup_ml_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_near_dup_pairs(spark, load_table(spark, sf_dir, "documents"))
