"""Second batch of TPC-H-shaped inventory queries — wider relational
coverage: correlated-style filters (HAVING), nation-pair joins,
conditional aggregation, complex OR pushdown, exact quantiles, pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.io.readers import load_table
from hops_spark.registry import register


@register(
    "q7_volume_shipping",
    sql="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY cust_nation, supp_nation, l_year
    ORDER BY cust_nation, supp_nation, l_year
    """,
    doc="TPC-H Q7-shaped: nation-pair trade volume by year (symmetric "
        "OR join filter, broadcast dims).",
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
             .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
             .filter(((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
                     | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")))
             .groupBy("cust_nation", "supp_nation",
                      F.year("l_shipdate").alias("l_year"))
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue"))
             .orderBy("cust_nation", "supp_nation", "l_year"))


@register(
    "q10_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-shaped: revenue lost to returns per customer, top 20.",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("c_custkey", "c_name", "n_name")
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue"))
             .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
             .limit(20))


@register(
    "q14_promo_revenue",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
    """,
    doc="TPC-H Q14-shaped: conditional aggregation (promo revenue share).",
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.filter((F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp")))
             .join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc)
                                         .otherwise(0)) / F.sum(disc), 4)
                   .alias("promo_pct"),
                  F.count("*").alias("n_lines")))


@register(
    "q18_large_orders",
    sql="""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           round(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
    doc="TPC-H Q18-shaped: HAVING over a grouped fact, join back to "
        "headers (aggregate-then-join keeps the shuffle on the small "
        "aggregated side).",
    tags=("join", "agg", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq"))
            .filter(F.col("tq") > 150))
    return (big.join(o, big.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                       F.round("tq", 2).alias("total_qty"))
               .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
               .limit(50))


@register(
    "q19_disjunctive_filter",
    sql="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19-shaped: disjunctive multi-attribute predicate across "
        "the join — exercises OR pushdown/CNF handling.",
    tags=("join", "filter"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40)))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .filter(cond)
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue"),
                  F.count("*").alias("n")))


@register(
    "q2_min_cost_supplier",
    sql="""
    WITH ranked AS (
        SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal,
               row_number() OVER (PARTITION BY n.n_regionkey
                                  ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT s_suppkey, s_name, n_name, s_acctbal
    FROM ranked WHERE rn = 1
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q2-shaped: argmax within group (best supplier per region) "
        "via ranking window.",
    tags=("join", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy(F.col("s_acctbal").desc(),
                                                  F.col("s_suppkey"))
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("s_suppkey", "s_name", "n_name", "s_acctbal")
             .orderBy("s_suppkey"))


@register(
    "exact_quantiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.5), 6)  AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact interpolated quantiles (SampleQuantiles/WordMedian family, "
        "SURVEY §2.4) — Spark percentile() ≡ DuckDB quantile_cont; the "
        "scale default is percentile_approx (rows-only check in "
        "approx_distinct_parts).",
    tags=("agg", "quantile"),
)
def exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
                   F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("q50"),
                   F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
                   F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("price_p90"))
              .orderBy("l_returnflag"))


@register(
    "pivot_status_by_flag",
    sql="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pivot (declared superset; reference emits multi-key rows by "
        "hand) — explicit value list keeps the plan a single aggregate.",
    tags=("agg", "pivot", "superset"),
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .pivot("l_linestatus", ["O", "F"])
              .agg(F.round(F.sum("l_quantity"), 2))
              .withColumnRenamed("O", "qty_O")
              .withColumnRenamed("F", "qty_F")
              .orderBy("l_returnflag"))
