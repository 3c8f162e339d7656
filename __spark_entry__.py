"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are derived from the engine's query registry
(serene_spark/registry.py): every registered operator carries its PySpark
callable and, where SQL-expressible, a DuckDB oracle generated from the same
dialect-shimmed SQL definition.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serene_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scalar profiling pass (SURVEY §2.3) over customer at sf0.001.

    The heart of the reference — per-column profiling features feeding the
    semantic-type classifier — expressed as one long-format aggregation.
    """
    from serene_spark.operators.profile_scalar import profile_scalar

    return profile_scalar(spark, "/root/testdata/sf0.001", "customer")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
