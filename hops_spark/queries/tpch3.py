"""Third TPC-H batch — the remaining query shapes: EXISTS/NOT-EXISTS
(semi/anti joins), scalar subqueries, correlated per-group thresholds,
left-outer distribution, argmax-by-scalar, count-distinct grouping.

The fixtures lack ``partsupp``/commit-receipt dates, so queries that
need them are shape-preserving adaptations on the tables that exist
(same operator structure, different literal predicates). Together with
tpch.py / tpch2.py this completes the 22-query TPC-H operator surface.

Reference parity: the reference expresses each of these shapes as a
hand-written MR pipeline (tagged reduce-side join for exists/anti —
hadoop-tools/hadoop-datajoin/.../DataJoinReducerBase.java; aggregate
framework for grouped counts — mapreduce/lib/aggregate/); here each is
one declarative plan Catalyst can optimize end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.registry import register


@register(
    "q4_order_priority",
    sql="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4-shaped: EXISTS → left-semi join, then count by "
        "priority. The semi join shuffles only the order keys, never "
        "widens rows (reference: hand-written tagged reduce-side join, "
        "DataJoinReducerBase.java).",
    tags=("join", "semi", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("order_count"))
             .orderBy("o_orderpriority"))


@register(
    "q8_market_share",
    sql="""
    SELECT year(o.o_orderdate) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_1'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8-shaped: NATION_1 suppliers' market share of ASIA "
        "customers' spend by year — conditional-sum ratio over a "
        "5-way join; all dims broadcast, one fact shuffle.",
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
             .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
             .groupBy(F.year("o_orderdate").alias("o_year"))
             .agg(F.round(
                 F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(0))
                 / F.sum(rev), 6).alias("mkt_share"))
             .orderBy("o_year"))


@register(
    "q9_product_profit",
    sql="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.1), 2) AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9-shaped: profit per supplier-nation per year (cost "
        "term adapted to p_retailprice; fixtures have no partsupp). "
        "Part filter prunes the fact before the orders join.",
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.1)
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
             .join(o, l.l_orderkey == o.o_orderkey)
             .groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
             .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
             .orderBy(F.col("nation"), F.col("o_year").desc()))


@register(
    "q11_important_stock",
    sql="""
    WITH pv AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM pv
    WHERE value > (SELECT avg(value) * 1.5 FROM pv)
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11-shaped: per-part traded value above a fraction of "
        "the global average — scalar subquery realized as a 1-row "
        "broadcast cross join (no single-partition window, scale-safe; "
        "avg-relative threshold stays non-degenerate at every sf).",
    tags=("agg", "scalar-subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pv = (l.groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")))
    total = pv.agg((F.avg("value") * 1.5).alias("threshold"))
    return (pv.join(F.broadcast(total))
              .filter(F.col("value") > F.col("threshold"))
              .select("l_partkey", F.round("value", 2).alias("value"))
              .orderBy(F.col("value").desc(), F.col("l_partkey")))


@register(
    "q12_priority_by_status",
    sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12-shaped: urgent/non-urgent line counts per status "
        "(shipmode column adapted to l_linestatus buckets).",
    tags=("join", "agg"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy("l_linestatus")
             .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                  F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
             .orderBy("l_linestatus"))


@register(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13-shaped: distribution of per-customer order counts — "
        "left outer join (null-preserving count) then re-aggregation "
        "of the aggregate.",
    tags=("join", "outer", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy(c.c_custkey)
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count("*").alias("custdist"))
                    .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15-shaped: supplier(s) achieving the max quarterly "
        "revenue — argmax via scalar-max broadcast join against the "
        "aggregated view (not a global window).",
    tags=("agg", "scalar-subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    s = load_table(spark, sf_dir, "supplier")
    revenue = (l.groupBy("l_suppkey")
                .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                      .alias("total_rev")))
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (revenue.join(F.broadcast(mx))
                   .filter(F.col("total_rev") == F.col("mx"))
                   .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
                   .select("s_suppkey", "s_name", "total_rev")
                   .orderBy("s_suppkey"))


@register(
    "q16_supplier_cnt",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16-shaped: distinct-supplier counts per (brand, type, "
        "size) with NOT-IN-style exclusion; partial distinct happens "
        "map-side before the shuffle.",
    tags=("join", "agg", "distinct"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .groupBy("p_brand", "p_type", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
             .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"))


@register(
    "q17_small_qty_revenue",
    sql="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17-shaped: correlated per-part average threshold — "
        "decorrelated into a grouped-avg build side joined back to "
        "the fact (exactly what Catalyst/DuckDB do internally).",
    tags=("join", "agg", "correlated"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = (l.groupBy(F.col("l_partkey").alias("ap_partkey"))
                .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold")))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
             .filter(F.col("l_quantity") < F.col("qty_threshold"))
             .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")))


@register(
    "q20_part_suppliers",
    sql="""
    WITH pq AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%e%'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN pq ON pq.l_suppkey = s.s_suppkey
    WHERE pq.qty > 100
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20-shaped: suppliers who moved >100 units of any "
        "matching part — semi-join against a grouped build side.",
    tags=("join", "semi", "agg"),
)
def q20_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    s = load_table(spark, sf_dir, "supplier")
    pq = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
           .groupBy("l_suppkey", "l_partkey")
           .agg(F.sum("l_quantity").alias("qty"))
           .filter(F.col("qty") > 100))
    return (s.join(pq, s.s_suppkey == pq.l_suppkey, "left_semi")
             .select("s_suppkey", "s_name")
             .orderBy("s_suppkey"))


@register(
    "q21_sole_returner",
    sql="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="TPC-H Q21-shaped: suppliers solely responsible for returns on "
        "multi-supplier finished orders (EXISTS + NOT EXISTS). "
        "Decorrelated: one order-level aggregate (distinct suppliers, "
        "distinct returning suppliers) replaces both correlated "
        "subqueries — two scans instead of three, one shuffle each.",
    tags=("join", "semi", "anti", "agg"),
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    # Order-level facts: how many distinct suppliers touched the order,
    # and how many of them had a returned ('R') line. Pre-distinct on
    # (order, supplier) then plain count/sum — avoids the Expand node a
    # double countDistinct plans (2x the shuffle rows, ~30% slower
    # measured at sf0.1).
    pairs = (l.groupBy(F.col("l_orderkey").alias("agg_orderkey"), "l_suppkey")
              .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                    .alias("has_r")))
    per_order = (pairs.groupBy("agg_orderkey")
                      .agg(F.count("*").alias("n_supp"),
                           F.sum("has_r").alias("n_ret_supp")))
    # EXISTS other-supplier        ≡ n_supp >= 2
    # NOT EXISTS other-ret-supplier≡ the only returning supplier is l1's
    #                                (l1 itself has R, so n_ret_supp == 1)
    qualifying = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
              .join(qualifying, F.col("l_orderkey") == F.col("agg_orderkey"), "left_semi")
              .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("s_name")
              .agg(F.count("*").alias("numwait"))
              .orderBy(F.col("numwait").desc(), F.col("s_name"))
              .limit(25))


@register(
    "q22_dormant_customers",
    sql="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1995)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22-shaped: well-funded customers with no 1995 orders — "
        "scalar-avg broadcast + anti join (every customer has *some* "
        "order in the fixtures, so the anti join is year-scoped).",
    tags=("join", "anti", "scalar-subquery", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o95 = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
                .agg(F.avg("c_acctbal").alias("a")))
    return (c.join(F.broadcast(avg_bal))
             .filter(F.col("c_acctbal") > F.col("a"))
             .join(o95, c.c_custkey == o95.o_custkey, "left_anti")
             .groupBy("c_nationkey")
             .agg(F.count("*").alias("numcust"),
                  F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
             .orderBy("c_nationkey"))


@register(
    "supplier_hhi",
    sql="""
    WITH rev AS (
        SELECT n.n_name AS nation, l.l_suppkey AS suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY nation, suppkey
    ), tot AS (
        SELECT nation, CAST(sum(cents) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY nation
    )
    SELECT r.nation, t.n_suppliers,
           CAST(sum((r.cents * 1000000 // t.total)
                    * (r.cents * 1000000 // t.total)) // 1000000
                AS BIGINT) AS hhi_ppm
    FROM rev r JOIN tot t USING (nation)
    GROUP BY r.nation, t.n_suppliers
    ORDER BY r.nation
    """,
    doc="Herfindahl-Hirschman market-concentration index per nation: "
        "each supplier's revenue share in integer ppm, HHI = "
        "sum(share_ppm^2) div 1e6 (0..1e6 scale; a monopoly scores "
        "1e6) — all integer arithmetic, engine-identical. Two keyed "
        "aggregates + two broadcast dimension joins; the share "
        "normalization reuses the per-nation Exchange.",
    tags=("tpch", "analytics", "profiling"),
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
         .cast("long").alias("cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"),
                      F.col("l_suppkey").alias("suppkey"))
             .agg(F.sum("cents").alias("cents")))
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_suppliers"))
    return (rev.join(tot, "nation")
               .groupBy("nation", "n_suppliers")
               .agg(F.expr("sum((cents * 1000000 div total) * "
                           "(cents * 1000000 div total)) div 1000000")
                     .cast("long").alias("hhi_ppm"))
               .orderBy("nation"))
