"""Process guard: the registry must import — full stop.

Round 7 shipped a module-level NameError in one operator file; because
``registry.load_all()`` imports every operator module, the single bad
line zeroed the whole engine (0/341 queries loadable, pytest could not
collect, bench DNF). This test is named ``test_aaa_*`` so it collects
and runs first: it costs ~2 s and turns that failure mode into an
instant, obvious red. Run it before ANY end-of-round commit.

No SparkSession needed — load_all() only imports modules and builds the
query table; it never touches a cluster.
"""

from __future__ import annotations


def test_registry_imports_and_is_populated():
    from serene_spark.registry import load_all

    queries = load_all()
    # The registry reached 363 queries in round 11; never let it
    # silently shrink below the last green waterline.
    assert len(queries) >= 363
    # Every entry must expose a callable Spark runner; oracle SQL is
    # optional (non-SQL-expressible ops) but must be a string when set.
    for name, q in queries.items():
        assert callable(q.spark), name
        if q.oracle is not None:
            assert isinstance(q.oracle, str) and q.oracle.strip(), name


def test_spark_entry_surface():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 363
    # every oracle key must correspond to a registered query
    assert set(oracles) <= set(qs)
