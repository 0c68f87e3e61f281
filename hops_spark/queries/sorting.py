"""Sort / partition / top-k / secondary-sort inventory queries
(SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.io.readers import load_table
from hops_spark.ops import sort as S
from hops_spark.registry import register


@register(
    "total_order_sort",
    sql="""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS global_rank
    FROM lineitem
    WHERE l_orderkey <= 1000
    ORDER BY global_rank
    """,
    doc="Total-order sort (Sort example / TotalOrderPartitioner parity, "
        "examples/Sort.java:57): global rank over range-partitioned sort. "
        "Unique (orderkey, linenumber) keys make the rank deterministic.",
    tags=("sort",),
)
def total_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    # two-phase TeraSort-style rank — never a single-partition window
    return (S.total_order_rank(li.select("l_orderkey", "l_linenumber"),
                               "l_orderkey", "l_linenumber")
             .orderBy("global_rank"))


@register(
    "secondary_sort",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS seq,
           sum(l_quantity)  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                  ROWS UNBOUNDED PRECEDING) AS running_qty,
           lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)
                                  AS prev_line
    FROM lineitem
    WHERE l_orderkey <= 400
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Secondary sort (partition by k1, iterate in k2 order) realized as "
        "window functions (reference SecondarySort.java:51, "
        "ReduceContextImpl.java:66).",
    tags=("sort", "window"),
)
def secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (li.select("l_orderkey", "l_linenumber", "l_quantity")
              .withColumn("seq", F.row_number().over(w))
              .withColumn("running_qty",
                          F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("prev_line", F.lag("l_linenumber").over(w))
              .orderBy("l_orderkey", "l_linenumber"))


@register(
    "key_field_sort",
    sql="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    ORDER BY p_brand ASC, CAST(p_retailprice AS DOUBLE) DESC, p_partkey
    LIMIT 50
    """,
    doc="KeyFieldBasedComparator: unix-sort field specs '-k2' + '-k3nr' "
        "(reference KeyFieldBasedComparator.java:53).",
    tags=("sort",),
)
def key_field_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    # "-k2 -k3nr -k1": brand asc, retailprice numeric desc, partkey asc tiebreak
    specs = S.parse_key_specs(["-k2", "-k3nr", "-k1"],
                              ["p_partkey", "p_brand", "p_retailprice"])
    return p.orderBy(*specs).limit(50)


@register(
    "top_k_per_group",
    sql="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM ranked WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Per-group top-k via row_number window — scalable form of the "
        "reference's sort+single-reducer idiom (examples/Grep.java:85-90).",
    tags=("sort", "topk", "window"),
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (S.top_k_per_group(o.select("o_custkey", "o_orderkey", "o_totalprice"),
                              ["o_custkey"], 3,
                              F.col("o_totalprice").desc(), F.col("o_orderkey"),
                              rank_col="rn", keep_rank=True)
             .orderBy("o_custkey", "rn"))


@register(
    "ranking_windows",
    sql="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS delta_from_avg
    FROM customer
    ORDER BY c_nationkey, rnk, c_custkey
    """,
    doc="Full ranking/analytic window surface — declared superset "
        "(SURVEY §2.5 window note).",
    tags=("sort", "window", "superset"),
)
def ranking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    wp = Window.partitionBy("c_nationkey")
    return (c.select("c_nationkey", "c_custkey", "c_acctbal")
             .withColumn("rnk", F.rank().over(w))
             .withColumn("drnk", F.dense_rank().over(w))
             .withColumn("delta_from_avg",
                         F.round(F.col("c_acctbal") - F.avg("c_acctbal").over(wp), 4))
             .orderBy("c_nationkey", "rnk", "c_custkey"))


@register(
    "distribution_windows",
    sql="""
    SELECT c_nationkey, c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm,
           CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_ppm,
           lag(c_custkey)  OVER w AS prev_cust,
           lead(c_custkey) OVER w AS next_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, pct_rank_ppm, c_custkey
    """,
    doc="Distribution/navigation window surface: ntile quartiles, "
        "percent_rank, cume_dist, lag/lead — completes the §2.5 window "
        "superset next to ranking_windows. percent_rank/cume_dist are "
        "single divisions of identical integers, so the doubles are "
        "engine-identical — but decimal ROUNDING of them is not "
        "(dyadic ratios land exactly on .5 at 6dp and Spark HALF_UP != "
        "DuckDB half-even; observed at sf0.1), so both sides emit "
        "tie-free floor-ppm integers. One Exchange on the partition "
        "key.",
    tags=("sort", "window", "superset"),
)
def distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"),
                                                  F.asc("c_custkey"))
    return (c.select(
                "c_nationkey", "c_custkey",
                F.ntile(4).over(w).cast("bigint").alias("quartile"),
                F.floor(F.percent_rank().over(w) * 1000000)
                 .cast("bigint").alias("pct_rank_ppm"),
                F.floor(F.cume_dist().over(w) * 1000000)
                 .cast("bigint").alias("cume_ppm"),
                F.lag("c_custkey").over(w).alias("prev_cust"),
                F.lead("c_custkey").over(w).alias("next_cust"))
             .orderBy("c_nationkey", "pct_rank_ppm", "c_custkey"))
