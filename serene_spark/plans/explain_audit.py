"""Physical-plan audits — keep the plans honest at scale.

``.explain`` output is the contract with Catalyst: these helpers assert the
properties every operator must keep when the data grows 1000x — filters and
projections reaching the parquet scan, whole-stage codegen in the hot path,
no accidental cartesian products, broadcast joins where a side is small.
Used by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def final_plan_text(df: DataFrame) -> str:
    """Plan text AFTER executing this exact DataFrame.

    Under AQE the physical plan (including WholeStageCodegen stage markers)
    is only finalized at runtime — ``isFinalPlan=false`` until the very
    DataFrame object is executed (a separate ``df.count()`` builds its own
    adaptive plan and leaves this one untouched).
    """
    df.collect()
    return plan_text(df)


def pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries pushed-down filters."""
    txt = plan_text(df)
    return "PushedFilters: [" in txt and "PushedFilters: []" not in txt


def read_schema_columns(df: DataFrame) -> int:
    """Number of columns actually read from parquet (column pruning check)."""
    txt = plan_text(df)
    counts = []
    for line in txt.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1]
            counts.append(schema.count(":"))
    return max(counts) if counts else -1


def has_codegen(df: DataFrame) -> bool:
    """True if the executed plan runs inside whole-stage codegen spans.

    Formatted explain marks codegen stages with ``*`` and a ``codegen id``
    annotation (the literal ``WholeStageCodegen`` only appears in simple
    mode's non-adaptive plans).
    """
    return "codegen id" in final_plan_text(df)


def has_cartesian(df: DataFrame) -> bool:
    txt = plan_text(df)
    return "CartesianProduct" in txt or "BroadcastNestedLoopJoin" in txt


def broadcast_join_count(df: DataFrame) -> int:
    return plan_text(df).count("BroadcastHashJoin")
