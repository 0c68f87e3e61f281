"""Set operations (SURVEY.md §2.6).

Reference forms: union = multi-path inputs (MultipleInputs.java:40);
distinct = sort+emit-once reducer / UniqValueCount; intersect/except =
hand-written tagged joins (hadoop-datajoin). All are first-class here.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, by_name: bool = True) -> DataFrame:
    if by_name:
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    return reduce(lambda a, b: a.union(b), dfs)


def distinct(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Distinct → partial+final hash aggregate (the reference's
    sort-shuffle-emit-once, minus the sort)."""
    return df.dropDuplicates(subset) if subset else df.distinct()


def intersect(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    return a.intersectAll(b) if all_rows else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    return a.exceptAll(b) if all_rows else a.subtract(b)
