"""Inventory-query registry.

Every operator from SURVEY.md §2 that we claim as implemented gets a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result on the same parquet tables. The driver's correctness gate runs
both sides and hash-compares; column names/aliases MUST match.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None = None          # DuckDB oracle; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an inventory query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""),
                                  tags=tuple(tags))
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registrations run, then return the registry."""
    import hops_spark.queries  # noqa: F401  (package __init__ imports submodules)
    return QUERIES
