"""ANN quality ledger (judge round-8 item 9): recall@k of every
approximate index against the exact cosine top-k, with wall times, at a
given scale factor.

Variants swept:
* sign-LSH bucketed (corpus-size-derived bit width), multiprobe on/off
* IVF-Flat, n_probe in {1, 2, 4, 8} over 16 coarse centroids
* PQ ADC (8x8-dim subspaces, 16 codewords) and PQ with exact re-rank

k and the query-set size are widened from the parity defaults (5/10) to
the ledger's 10/32 by patching the module constants BEFORE the SQL
generators run (they interpolate module globals at call time) — the
registered parity queries are untouched.

Usage: python tools/bench_ann_recall.py [SF_DIR]
Prints one JSON line (recorded in BASELINE.md's ANN-recall section).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scale_data", "sf10")

    import serene_spark.operators.similarity as S
    from serene_spark.catalog import register_views
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.session import get_spark

    S.N_QUERIES = 32
    S.TOP_K = 10
    S.PQ_QUERIES = 32
    S.PQ_TOP_K = 10

    spark = get_spark("serene-ann-recall")
    register_views(spark, sf_dir, ("embeddings",), spread=True)
    n_vecs = spark.table("embeddings").count()

    def run(sql: str) -> tuple[dict[int, set[int]], float]:
        t0 = time.time()
        rows = spark.sql(sql).collect()
        sec = round(time.time() - t0, 2)
        by_q: dict[int, set[int]] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return by_q, sec

    exact, exact_sec = run(S.cosine_topk_sql(SPARK))
    out = {
        "sf_dir": sf_dir, "n_vectors": n_vecs,
        "n_queries": S.N_QUERIES, "k": S.TOP_K,
        "exact_cosine_topk_sec": exact_sec,
        "variants": {},
    }

    def recall(approx: dict[int, set[int]]) -> float:
        num = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
        den = sum(len(nb) for nb in exact.values())
        return round(num / den, 4)

    variants = [
        ("sign_lsh_multiprobe", S.ann_bucketed_sql(SPARK, multiprobe=True)),
        ("sign_lsh_home_bucket_only", S.ann_bucketed_sql(SPARK, multiprobe=False)),
    ]
    for n_probe in (1, 2, 4, 8):
        variants.append((f"ivf_nprobe_{n_probe}",
                         S.ivf_search_sql(SPARK, n_probe=n_probe)))
    # scale-tuned IVF geometry: centroids ~ sqrt(N) with proportional
    # probes — the production knob the parity-sized k=16 lacks
    import math
    k_scaled = max(16, 1 << int(math.log2(max(16, int(n_vecs ** 0.5)))))
    for n_probe in (k_scaled // 16, k_scaled // 8, k_scaled // 4):
        variants.append((f"ivf_k{k_scaled}_nprobe_{n_probe}",
                         S.ivf_search_sql(SPARK, k=k_scaled, n_probe=n_probe)))
    variants.append(("pq_adc", S.pq_adc_sql(SPARK)))
    variants.append(("pq_rerank_pool50", S.pq_rerank_sql(SPARK)))
    # scale-tuned re-rank pool: recall of a CONSTANT pool decays with
    # corpus size; 0.5% of the corpus is the production sizing
    S.PQ_RERANK_POOL = max(50, n_vecs // 200)
    variants.append((f"pq_rerank_pool{S.PQ_RERANK_POOL}",
                     S.pq_rerank_sql(SPARK)))

    for name, sql in variants:
        approx, sec = run(sql)
        out["variants"][name] = {"recall_at_k": recall(approx), "sec": sec}

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
