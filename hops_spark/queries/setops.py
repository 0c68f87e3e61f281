"""Set-operation inventory queries (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import setops as SO
from hops_spark.registry import register


def _buyers(spark, sf_dir):
    """Nations that have customers."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(F.col("c_nationkey").alias("nationkey")).distinct()


def _suppliers(spark, sf_dir):
    """Nations that have suppliers."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(F.col("s_nationkey").alias("nationkey")).distinct()


@register(
    "set_union_distinct",
    sql="""
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    ) ORDER BY nationkey
    """,
    doc="Union + distinct (reference MultipleInputs + emit-once reducer).",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (SO.distinct(SO.union_all(_buyers(spark, sf_dir), _suppliers(spark, sf_dir)))
              .orderBy("nationkey"))


@register(
    "set_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="Intersect — reference idiom: tagged reduce-side join keeping "
        "both-tag keys (hadoop-datajoin).",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SO.intersect(_buyers(spark, sf_dir), _suppliers(spark, sf_dir)).orderBy("nationkey")


@register(
    "set_except",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="Except — tagged-join keeping only-left keys.",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SO.except_(_buyers(spark, sf_dir), _suppliers(spark, sf_dir)).orderBy("nationkey")


@register(
    "distinct_rows",
    sql="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE l_orderkey <= 500
    ORDER BY l_returnflag, l_linestatus, l_shipdate
    """,
    doc="Multi-column distinct (sort+emit-once reducer parity).",
    tags=("setop",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return (SO.distinct(li.select("l_returnflag", "l_linestatus", "l_shipdate"))
              .orderBy("l_returnflag", "l_linestatus", "l_shipdate"))
