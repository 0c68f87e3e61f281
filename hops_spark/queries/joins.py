"""Join-language inventory queries (SURVEY.md §2.3).

inner(a,b,...) / outer(a,b,...) / override(a,b,...) from the reference's
CompositeInputFormat join language (mapreduce/lib/join/), plus the
semi/anti/as-of supersets.

The KV sources mirror the reference's join tests (TestJoinDatamerge):
per-nation aggregates from customer and supplier play the role of two
sorted KV inputs keyed by nationkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import join as J
from hops_spark.registry import register


def _cust_by_nation(spark, sf_dir):
    return (load_table(spark, sf_dir, "customer")
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.round(F.sum("c_acctbal"), 2).alias("acctbal"),
                 F.count("*").alias("cnt")))


def _supp_by_nation(spark, sf_dir):
    return (load_table(spark, sf_dir, "supplier")
            .groupBy(F.col("s_nationkey").alias("nationkey"))
            .agg(F.round(F.sum("s_acctbal"), 2).alias("acctbal"),
                 F.count("*").alias("cnt")))


_CTE = """
    WITH ca AS (
        SELECT c_nationkey AS nationkey, round(sum(c_acctbal), 2) AS acctbal,
               count(*) AS cnt
        FROM customer GROUP BY c_nationkey
    ), sa AS (
        SELECT s_nationkey AS nationkey, round(sum(s_acctbal), 2) AS acctbal,
               count(*) AS cnt
        FROM supplier GROUP BY s_nationkey
    )
"""


@register(
    "join_inner",
    sql=_CTE + """
    SELECT ca.nationkey,
           ca.acctbal AS s0_acctbal, ca.cnt AS s0_cnt,
           sa.acctbal AS s1_acctbal, sa.cnt AS s1_cnt
    FROM ca JOIN sa USING (nationkey)
    ORDER BY nationkey
    """,
    doc="inner(a,b): emit iff all sources have the key "
        "(reference InnerJoinRecordReader.java:34).",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _cust_by_nation(spark, sf_dir)
    b = _supp_by_nation(spark, sf_dir)
    return J.inner_join("nationkey", a, b).orderBy("nationkey")


@register(
    "join_outer",
    sql=_CTE + """
    SELECT coalesce(ca.nationkey, sa.nationkey) AS nationkey,
           ca.acctbal AS s0_acctbal, ca.cnt AS s0_cnt,
           sa.acctbal AS s1_acctbal, sa.cnt AS s1_cnt
    FROM ca FULL OUTER JOIN sa USING (nationkey)
    ORDER BY nationkey
    """,
    doc="outer(a,b): emit if any source has the key, null slots "
        "(reference OuterJoinRecordReader.java:34).",
    tags=("join",),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _cust_by_nation(spark, sf_dir)
    b = _supp_by_nation(spark, sf_dir)
    return J.outer_join("nationkey", a, b).orderBy("nationkey")


@register(
    "join_override",
    sql=_CTE + """
    SELECT coalesce(ca.nationkey, sa.nationkey) AS nationkey,
           coalesce(sa.acctbal, ca.acctbal) AS acctbal,
           coalesce(sa.cnt, ca.cnt) AS cnt
    FROM ca FULL OUTER JOIN sa USING (nationkey)
    ORDER BY nationkey
    """,
    doc="override(a,b): rightmost source with the key wins "
        "(reference OverrideRecordReader.java:42-117).",
    tags=("join",),
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _cust_by_nation(spark, sf_dir)
    b = _supp_by_nation(spark, sf_dir)
    return J.override_join("nationkey", ["acctbal", "cnt"], a, b).orderBy("nationkey")


@register(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    doc="left_semi (EXISTS) — datajoin tagged-join idiom made first-class "
        "(SURVEY §2.3 note).",
    tags=("join", "superset"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_totalprice") > 300000)
           .select(F.col("o_custkey").alias("c_custkey")))
    return (J.semi_join(c, big, "c_custkey")
             .select("c_custkey", "c_name").orderBy("c_custkey"))


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="left_anti (NOT EXISTS).",
    tags=("join", "superset"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .select(F.col("o_custkey").alias("c_custkey")))
    return (J.anti_join(c, o, "c_custkey")
             .select("c_custkey", "c_name").orderBy("c_custkey"))


@register(
    "join_asof",
    sql="""
    WITH ords AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ), probe AS (
        SELECT o_custkey AS custkey, o_orderdate AS probe_ts
        FROM ords WHERE rn = 3
    ), cand AS (
        SELECT p.custkey, p.probe_ts, o.o_orderkey,
               row_number() OVER (PARTITION BY p.custkey
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rnk
        FROM probe p
        JOIN orders o ON o.o_custkey = p.custkey AND o.o_orderdate < p.probe_ts
    )
    SELECT custkey, probe_ts, o_orderkey AS last_orderkey
    FROM cand WHERE rnk = 1
    ORDER BY custkey
    """,
    doc="as-of join — MapFile.getClosest (io/MapFile.java:699) generalized: "
        "for each probe (customer's 3rd order date), the latest strictly "
        "earlier order. The generic union-sort asof operator (ops/join.py "
        "asof_join — one shuffle, no range cross-join) is exercised in tests; "
        "this inventory query pins the strictly-before variant.",
    tags=("join", "superset", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    probe = (o.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 3)
              .select(F.col("o_custkey").alias("custkey"),
                      F.col("o_orderdate").alias("probe_ts")))
    right = o.select(F.col("o_custkey").alias("custkey"),
                     F.col("o_orderdate").alias("ots"),
                     F.col("o_orderkey"))
    wr = Window.partitionBy("custkey", "probe_ts").orderBy(
        F.col("ots").desc(), F.col("o_orderkey").desc())
    return (probe.join(right, "custkey")
                 .filter(F.col("ots") < F.col("probe_ts"))
                 .withColumn("rnk", F.row_number().over(wr))
                 .filter(F.col("rnk") == 1)
                 .select("custkey", "probe_ts",
                         F.col("o_orderkey").alias("last_orderkey"))
                 .orderBy("custkey"))


@register(
    "salted_join_skew",
    sql="""
    WITH stats AS (
        SELECT event_type, round(avg(value), 6) AS type_avg
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_above,
           round(sum(e.value - s.type_avg), 2) AS excess_sum
    FROM events e JOIN stats s USING (event_type)
    WHERE e.value > s.type_avg
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Skew-proof replicate-and-salt join (manual twin of AQE "
        "skewJoin): events (5 hot event_type keys — worst-case key "
        "skew) joined to per-type stats on (key, salt); the salt fans "
        "each hot key over 16 uniform partitions. Result is exactly "
        "the plain join's (salt-invariant), which the oracle checks.",
    tags=("join", "skew", "scale"),
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deliberately-skewed join shape: the join key has 5 distinct
    values, so an unsalted shuffle join melts 5 reducers no matter how
    many executors exist. salted_join spreads each key over n_salts
    partitions; the per-type stats dim (5 rows here, dimension-sized in
    general) replicates map-side. Events above their type average,
    with the aggregate riding the salted output."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = (e.groupBy("event_type")
              .agg(F.round(F.avg("value"), 6).alias("type_avg")))
    joined = J.salted_join(e, stats, "event_type", n_salts=16)
    return (joined.where(F.col("value") > F.col("type_avg"))
                  .groupBy("event_type")
                  .agg(F.count("*").alias("n_above"),
                       F.round(F.sum(F.col("value") - F.col("type_avg")), 2)
                        .alias("excess_sum"))
                  .orderBy("event_type"))


@register(
    "feature_store_pit",
    sql="""
    WITH clicks AS (
        SELECT user_id, ts, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), f_clicks AS (
        SELECT user_id, ts,
               CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
               AS n_clicks
        FROM clicks
    ), f_err AS (
        SELECT user_id, ts, round(max(value), 2) AS last_error_value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ), spine AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT s.event_id, s.user_id, s.ts,
           coalesce(c.n_clicks, 0) AS n_clicks,
           e.last_error_value
    FROM spine s
    ASOF LEFT JOIN f_clicks c ON s.user_id = c.user_id AND s.ts >= c.ts
    ASOF LEFT JOIN f_err e ON s.user_id = e.user_id AND s.ts >= e.ts
    ORDER BY s.event_id
    """,
    doc="Feature-store point-in-time-correct join: a purchase spine "
        "enriched with two feature tables (cumulative click count, "
        "last error value) AS OF each purchase's timestamp — no "
        "feature leakage from the future. Composed as two as-of joins "
        "(union-sort-window, one user_id shuffle each); the oracle is "
        "DuckDB's native ASOF LEFT JOIN, independently validating the "
        "window trick.",
    tags=("join", "asof", "feature-store", "events"),
)
def feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-set assembly join every feature store runs (and the
    reference's MapFile.getClosest generalized to many tables): each
    feature table is made unique per (user_id, ts) first — required
    for a deterministic as-of pick when timestamps collide — then the
    spine folds features in one as-of join per table. All joins hash
    on user_id, so Catalyst chains them on one partitioning; at 100 TB
    each as-of is a union-sort within the same Exchange, never a range
    cross-join."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    clicks = (e.where(F.col("event_type") == "click")
               .groupBy("user_id", "ts").agg(F.count("*").alias("c")))
    f_clicks = clicks.select(
        "user_id", "ts",
        F.sum("c").over(W.partitionBy("user_id").orderBy("ts"))
         .cast("bigint").alias("n_clicks"))
    f_err = (e.where(F.col("event_type") == "error")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 2).alias("last_error_value")))
    spine = (e.where(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts"))
    step1 = J.asof_join(spine, f_clicks, "user_id", "ts", "ts")
    step2 = J.asof_join(step1, f_err, "user_id", "ts", "ts")
    return (step2.select("event_id", "user_id", "ts",
                         F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
                         "last_error_value")
                 .orderBy("event_id"))


_BJ_M, _BJ_K = 2048, 3


@register(
    "bloom_semi_join",
    sql=f"""
    WITH dim AS (
        SELECT DISTINCT s_suppkey FROM supplier WHERE s_nationkey < 5
    ), gpos AS (
        SELECT DISTINCT
            ('0x' || substring(md5('bjoin|' || CAST(s_suppkey AS VARCHAR)
                                   || '|' || CAST(t.i AS VARCHAR)),
                               1, 15))::BIGINT % {_BJ_M} AS pos
        FROM dim, LATERAL (SELECT unnest(range(0, {_BJ_K})) AS i) t
    ), rowpass AS (
        -- per-row scalar probe: k IN-tests against the dim position
        -- set ((l_orderkey, l_linenumber) is NOT unique in the
        -- synthetic fixture, so no per-row grouping is possible)
        SELECT l_returnflag AS rf, l_suppkey AS sk,
               CASE WHEN {" AND ".join(
                   f"(('0x' || substring(md5('bjoin|' || "
                   f"CAST(l_suppkey AS VARCHAR) || '|{i}'), 1, 15))::BIGINT "
                   f"% {_BJ_M}) IN (SELECT pos FROM gpos)"
                   for i in range(_BJ_K))}
                    THEN 1 ELSE 0 END AS pass
        FROM lineitem
    )
    SELECT rf AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(pass) AS BIGINT) AS n_bloom_pass,
           CAST(sum(CASE WHEN sk IN (SELECT s_suppkey FROM dim)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(sum(CASE WHEN pass = 1 AND sk NOT IN
                              (SELECT s_suppkey FROM dim)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM rowpass GROUP BY rf ORDER BY rf
    """,
    doc="BLOOM-JOIN pre-filter census (the runtime-filter pattern "
        "Spark's AQE InjectRuntimeFilter automates, made explicit and "
        "engine-portable): the dim side (suppliers of 5 nations) "
        "builds an m-bit bloom bitmask riding as ONE literal int "
        "array; every lineitem row is probed MAP-SIDE in the scan "
        "(k md5 cell tests, zero joins for the filter itself), so "
        "non-matching fact rows die before any shuffle — at 100 TB "
        "the difference between shuffling the fact table and shuffling "
        "~selectivity of it. Per returnflag: rows, bloom passes, exact "
        "semi-join matches, and the false-positive count — the census "
        "proves no false NEGATIVES (pass >= true) and a bounded FP "
        "rate, the two properties that make the compose exact. "
        "ops/bloom.bloom_bitmask / bloom_join_filter.",
    tags=("join", "bloom", "sketch"),
)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops import bloom as B
    dim = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_nationkey") < 5)
           .select("s_suppkey").distinct())
    mask = B.bloom_bitmask(dim, "s_suppkey", _BJ_M, _BJ_K)
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_returnflag", "l_suppkey")
    passed = B.bloom_join_filter(F.col("l_suppkey"), mask, _BJ_M, _BJ_K)
    truth = dim.select(F.col("s_suppkey").alias("l_suppkey"),
                       F.lit(1).alias("_true"))
    flagged = (li.withColumn("_pass", passed.cast("int"))
                 .join(F.broadcast(truth), "l_suppkey", "left")
                 .withColumn("_true", F.coalesce("_true", F.lit(0))))
    return (flagged.groupBy("l_returnflag")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("_pass").cast("long").alias("n_bloom_pass"),
                 F.sum("_true").cast("long").alias("n_true_match"),
                 F.sum(F.when((F.col("_pass") == 1) & (F.col("_true") == 0),
                              1).otherwise(0)).cast("long")
                  .alias("n_false_pos"))
            .orderBy("l_returnflag"))
