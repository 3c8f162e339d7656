"""The --changed staleness gate (tools/parity.py).

Pins the property the round-4 review fix restored: a query whose SQL is
SPLICED from another module (function-level import) must be marked stale
when that module changes — module-file-only hashing left exactly those
queries falsely green.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import parity  # noqa: E402

from serene_spark.registry import load_all  # noqa: E402


def _hash_with_suffix(q, path: str, suffix: str) -> str:
    src = open(path, encoding="utf-8").read()
    try:
        with open(path, "a", encoding="utf-8") as fh:
            fh.write(suffix)
        parity._DEP_CACHE.clear()
        return parity._module_hash(q)
    finally:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(src)
        parity._DEP_CACHE.clear()


def test_spliced_sql_dependency_marks_query_stale():
    qs = load_all()
    cases = [
        # (query, module it splices SQL from at function level)
        ("curriculum_plan", "serene_spark/operators/text_analysis.py"),
        ("split_leakage_audit", "serene_spark/operators/dedup.py"),
        ("triangle_counts", "serene_spark/operators/graph_rank.py"),
    ]
    for name, dep in cases:
        q = qs[name]
        before = parity._module_hash(q)
        after = _hash_with_suffix(q, os.path.join(REPO, dep), "\n# staleness-pin\n")
        assert before != after, f"{name} not marked stale by {dep} edit"
    # and an unrelated module does NOT move the hash
    q = qs["curriculum_plan"]
    before = parity._module_hash(q)
    after = _hash_with_suffix(
        q, os.path.join(REPO, "serene_spark/operators/basket.py"), "\n# x\n"
    )
    assert before == after


def test_own_module_still_marks_stale():
    qs = load_all()
    q = qs["basket_part_lift"]
    before = parity._module_hash(q)
    after = _hash_with_suffix(
        q, os.path.join(REPO, "serene_spark/operators/basket.py"), "\n# y\n"
    )
    assert before != after
