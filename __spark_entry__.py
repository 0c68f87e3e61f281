"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query smoke check at sf0.001.
- ``queries()``: every implemented SURVEY.md §2 inventory operator,
  name → (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: matching DuckDB SQL per query (omitted for the few
  non-SQL-expressible ops → rows-only check).

The real registry lives in ``hops_spark/registry.py``; query
implementations are in ``hops_spark/queries/*`` with per-operator
reference citations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hops_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    specs = load_all()
    return specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in load_all().items()
            if spec.sql is not None}
