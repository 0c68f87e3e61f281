"""ValueAggregator-framework inventory queries (SURVEY.md §2.4).

Covers: LongValueSum/DoubleValueSum/Max/Min, StringValueMax/Min,
UniqValueCount (with deterministic cap), ValueHistogram, the
WordMean/WordMedian/WordStandardDeviation examples, and cube/rollup
(declared Spark superset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import agg as A
from hops_spark.ops.text import words
from hops_spark.registry import register


@register(
    "value_aggregator_job",
    sql="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           round(sum(l_extendedprice), 2)        AS sum_price,
           max(CAST(l_orderkey AS BIGINT))       AS max_orderkey,
           min(CAST(l_orderkey AS BIGINT))       AS min_orderkey,
           max(l_linestatus)                     AS max_status,
           min(l_linestatus)                     AS min_status,
           count(l_partkey)                      AS n_values,
           least(count(DISTINCT l_suppkey), 5)   AS uniq_supp_capped
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="ValueAggregatorJob spec-driven aggregation, one shuffle for the whole spec "
        "(reference mapreduce/lib/aggregate/ValueAggregatorJob.java:1-222).",
    tags=("agg",),
)
def value_aggregator_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = A.aggregate_job(
        li, ["l_returnflag"],
        [("LongValueSum", "l_quantity", "sum_qty"),
         ("DoubleValueSum", "l_extendedprice", "sum_price_raw"),
         ("LongValueMax", "l_orderkey", "max_orderkey"),
         ("LongValueMin", "l_orderkey", "min_orderkey"),
         ("StringValueMax", "l_linestatus", "max_status"),
         ("StringValueMin", "l_linestatus", "min_status"),
         ("ValueCount", "l_partkey", "n_values")])
    out = out.withColumn("sum_price", F.round(F.col("sum_price_raw"), 2)).drop("sum_price_raw")
    capped = (li.groupBy("l_returnflag")
                .agg(A.uniq_count("l_suppkey", max_unique=5).alias("uniq_supp_capped")))
    return (out.join(capped, "l_returnflag")
               .select("l_returnflag", "sum_qty", "sum_price", "max_orderkey",
                       "min_orderkey", "max_status", "min_status", "n_values",
                       "uniq_supp_capped")
               .orderBy("l_returnflag"))


@register(
    "uniq_value_count",
    sql="""
    SELECT o_orderpriority,
           count(DISTINCT o_orderstatus) AS n_uniq,
           array_to_string(list_sort(list(DISTINCT o_orderstatus))[1:2], '|')
               AS uniq_values_capped
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="UniqValueCount with cap — deterministic sort-then-slice semantics "
        "(reference UniqValueCount.java:35; SURVEY §7.4.5).",
    tags=("agg",),
)
def uniq_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(A.uniq_count("o_orderstatus").alias("n_uniq"),
                  F.concat_ws("|", A.uniq_values("o_orderstatus", max_unique=2))
                   .alias("uniq_values_capped"))
             .orderBy("o_orderpriority"))


@register(
    "value_histogram",
    sql="""
    WITH per_item AS (
        SELECT l_returnflag, l_suppkey, count(*) AS _n
        FROM lineitem GROUP BY l_returnflag, l_suppkey
    )
    SELECT l_returnflag,
           count(*)                    AS n_distinct_items,
           min(_n)                     AS min_count,
           median(_n)                  AS median_count,
           max(_n)                     AS max_count,
           round(avg(_n), 6)           AS avg_count,
           round(stddev_pop(_n), 6)    AS stddev_count,
           array_to_string(
               list(CAST(l_suppkey AS VARCHAR) || ':' || CAST(_n AS VARCHAR)
                    ORDER BY l_suppkey)[1:10], '|') AS items_capped
    FROM per_item
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="ValueHistogram: count/min/median/max/avg/stddev of per-item counts "
        "plus the retained item list (sorted, capped at 10, 'item:count|…') "
        "(reference ValueHistogram.java:38 getReport + getReportDetails).",
    tags=("agg",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = A.value_histogram(li, ["l_returnflag"], "l_suppkey")
    return (h.withColumn("avg_count", F.round("avg_count", 6))
             .withColumn("stddev_count", F.round("stddev_count", 6))
             .withColumn("median_count", F.col("median_count").cast("double"))
             .orderBy("l_returnflag"))


@register(
    "word_stats",
    sql="""
    WITH w AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
    SELECT count(*)                               AS n_words,
           round(avg(length(word)), 6)            AS mean_len,
           median(length(word))                   AS median_len,
           round(stddev_pop(length(word)), 6)     AS stddev_len
    FROM w
    """,
    doc="WordMean/WordMedian/WordStandardDeviation examples "
        "(reference examples/WordMean.java:42, WordMedian.java:43).",
    tags=("agg", "text"),
)
def word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(words("text")).alias("word"))
    return w.agg(F.count("*").alias("n_words"),
                 F.round(F.avg(F.length("word")), 6).alias("mean_len"),
                 F.expr("median(length(word))").cast("double").alias("median_len"),
                 F.round(F.stddev_pop(F.length("word")), 6).alias("stddev_len"))


@register(
    "rollup_revenue",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    doc="ROLLUP — declared Spark superset (reference has no grouping sets, "
        "SURVEY §2.4 note).",
    tags=("agg", "superset"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                   F.count("*").alias("n"))
              .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                      F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                      "sum_price", "n")
              .orderBy("returnflag", "linestatus"))


@register(
    "approx_distinct_parts",
    # Self-verifying oracle: the HLL estimate itself is engine-specific,
    # so the registered output is the exact count plus a boolean asserting
    # the estimate landed within 5 % — which DuckDB CAN check exactly.
    sql="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           true AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL) — the scale default for UniqValueCount-type "
        "questions; exact opt-in per SURVEY §7.4.6. Output is self-verifying: "
        "exact count + bounds-check boolean (|approx-exact|/exact <= 0.05), "
        "giving the approximate op a full value-hash oracle.",
    tags=("agg", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                   F.countDistinct("l_partkey").alias("exact_parts"))
              .select("l_returnflag", "exact_parts",
                      (F.abs(F.col("approx_parts") - F.col("exact_parts"))
                       / F.col("exact_parts") <= 0.05).alias("approx_within_5pct"))
              .orderBy("l_returnflag"))


@register(
    "salted_agg_revenue",
    sql="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_rows,
           max(CAST(l_orderkey AS BIGINT)) AS max_orderkey,
           min(CAST(l_orderkey AS BIGINT)) AS min_orderkey
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Skew-mitigated two-phase aggregation (RehashPartitioner parity, "
        "SURVEY §2.5): partial agg on (key, salt) then final merge on "
        "key — result must equal the direct single-phase aggregate, "
        "which is exactly what the oracle computes.",
    tags=("agg", "skew"),
)
def salted_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = A.salted_agg(
        li, ["l_returnflag"],
        [F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
         F.count("*").alias("n_rows"),
         F.max(F.col("l_orderkey")).alias("max_orderkey"),
         F.min(F.col("l_orderkey")).alias("min_orderkey")],
        salt_buckets=8)
    return (out.select("l_returnflag", "sum_qty", "n_rows",
                       "max_orderkey", "min_orderkey")
               .orderBy("l_returnflag"))


@register(
    "approx_quantiles_check",
    # Self-verifying like approx_distinct_parts: the sketch estimate is
    # engine-specific, so the registered output is the exact quantile
    # plus a bounds-check boolean the oracle can pin to true.
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS exact_p90,
           true AS approx_within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="SampleQuantiles / CKMS parity (util/SampleQuantiles.java): "
        "percentile_approx (GK sketch) checked against the exact "
        "interpolated quantiles — output is the exact values plus a "
        "within-1% boolean, giving the approximate op a full oracle.",
    tags=("agg", "approx"),
)
def approx_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("_em"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("_e90"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_am"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("_a90"))
    ok = ((F.abs(F.col("_am") - F.col("_em")) / F.col("_em") <= 0.01)
          & (F.abs(F.col("_a90") - F.col("_e90")) / F.col("_e90") <= 0.01))
    # round(…, 6), not 2: the interpolated median of 2-decimal money
    # values lands exactly on .xx5 half the time (average of two 2dp
    # values), so a 2dp round is a coin-flip between engines; at 6dp the
    # midpoint (3dp) is exact. Mirrors exact_quantiles.
    return (g.select("l_returnflag",
                     F.round("_em", 6).alias("exact_median"),
                     F.round("_e90", 6).alias("exact_p90"),
                     ok.alias("approx_within_1pct"))
             .orderBy("l_returnflag"))


@register(
    "cube_revenue",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS grouping_id,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY grouping_id, returnflag, linestatus
    """,
    doc="CUBE with GROUPING() provenance bits — completes the "
        "grouping-sets superset next to rollup_revenue (SURVEY §2.4 "
        "note: the reference has no grouping sets; Spark plans one "
        "Expand + one aggregate, a single scan for all 2^k cells).",
    tags=("agg", "superset"),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2
           + F.grouping("l_linestatus")).cast("bigint")
    return (li.cube("l_returnflag", "l_linestatus")
              .agg(gid.alias("grouping_id"),
                   F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                   F.count("*").alias("n"))
              .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                      F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                      "grouping_id", "sum_price", "n")
              .orderBy("grouping_id", "returnflag", "linestatus"))


_CBF_M, _CBF_K = 512, 3
# Shared oracle fragments: pos_i = ('0x'||md5(seed|key|i)[1:15])::BIGINT % m
# — the same 60-digest-bit cell hash ops/bloom.bloom_positions computes.


@register(
    "counting_bloom",
    sql=f"""
    WITH upd AS (
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS key, 1 AS w
        FROM documents
        UNION ALL
        SELECT 'doc_' || CAST(doc_id AS VARCHAR), -1
        FROM documents WHERE doc_id % 3 = 0
    ), cells AS (
        SELECT ('0x' || substring(md5('bloom|' || key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_CBF_M} AS pos,
               w
        FROM upd, LATERAL (SELECT unnest(range(0, {_CBF_K})) AS i) t
    ), grid AS (
        SELECT pos, CAST(sum(w) AS BIGINT) AS cnt
        FROM cells GROUP BY pos HAVING sum(w) <> 0
    ), probes AS (
        SELECT 'doc_' || CAST(x AS VARCHAR) AS probe_key
        FROM generate_series(0, 63) s(x)
        UNION ALL
        SELECT 'ghost_' || CAST(x AS VARCHAR) FROM generate_series(0, 15) s(x)
    ), pc AS (
        SELECT probe_key,
               ('0x' || substring(md5('bloom|' || probe_key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_CBF_M} AS pos
        FROM probes, LATERAL (SELECT unnest(range(0, {_CBF_K})) AS i) t
    ), j AS (
        SELECT probe_key, COALESCE(cnt, 0) AS c
        FROM pc LEFT JOIN grid USING (pos)
    )
    SELECT probe_key,
           CAST(min(c) >= 1 AS BIGINT) AS member,
           CAST(min(c) AS BIGINT) AS approx_cnt
    FROM j GROUP BY probe_key ORDER BY probe_key
    """,
    doc="CountingBloomFilter semantics (util/bloom/CountingBloomFilter"
        ".java): every doc key added, every 3rd deleted, then an 80-key "
        "panel membership-probed — member = all k counters nonzero, "
        "approx_cnt = min counter (approximateCount). The filter is a "
        "mergeable <=m-row integer grid (ops/bloom.py, the CMS pattern): "
        "one bounded aggregate builds it, probes broadcast-join it; "
        "deletes are exact counter decrements, the capability plain "
        "blooms lack.",
    tags=("agg", "sketch", "bloom"),
)
def counting_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops import bloom as B
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    adds = docs.select(key.alias("key"), F.lit(1).alias("w"))
    dels = (docs.filter(F.col("doc_id") % 3 == 0)
                .select(key.alias("key"), F.lit(-1).alias("w")))
    grid = B.counting_grid(adds.unionByName(dels), "key",
                           _CBF_M, _CBF_K, weight_col="w")
    probes = (spark.range(0, 64)
              .select(F.concat(F.lit("doc_"), F.col("id").cast("string"))
                       .alias("probe_key"))
              .unionByName(spark.range(0, 16).select(
                  F.concat(F.lit("ghost_"), F.col("id").cast("string"))
                   .alias("probe_key"))))
    return (B.counting_membership(grid, probes, "probe_key",
                                  _CBF_M, _CBF_K)
             .orderBy("probe_key"))


_DBF_NR, _DBF_M, _DBF_K = 2000, 1024, 3


@register(
    "dynamic_bloom",
    sql=f"""
    WITH ins AS (
        SELECT 'o_' || CAST(o_orderkey AS VARCHAR) AS key,
               CAST((row_number() OVER (ORDER BY o_orderkey) - 1)
                    // {_DBF_NR} AS BIGINT) AS epoch
        FROM orders
    ), bits AS (
        SELECT DISTINCT epoch,
               ('0x' || substring(md5('dyn|' || key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_DBF_M} AS pos
        FROM ins, LATERAL (SELECT unnest(range(0, {_DBF_K})) AS i) t
    ), probes AS (
        SELECT 'o_' || CAST(o_orderkey AS VARCHAR) AS probe_key
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT 'ghost_' || CAST(x AS VARCHAR) FROM generate_series(0, 15) s(x)
    ), pc AS (
        SELECT probe_key, t.i,
               ('0x' || substring(md5('dyn|' || probe_key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_DBF_M} AS pos
        FROM probes, LATERAL (SELECT unnest(range(0, {_DBF_K})) AS i) t
    ), hits AS (
        SELECT probe_key, epoch
        FROM pc JOIN bits USING (pos)
        GROUP BY probe_key, epoch
        HAVING count(DISTINCT i) = {_DBF_K}
    ), mm AS (
        SELECT probe_key, CAST(count(*) AS BIGINT) AS epochs_hit
        FROM hits GROUP BY probe_key
    )
    SELECT probe_key,
           CAST(CASE WHEN epochs_hit IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS member,
           CAST(COALESCE(epochs_hit, 0) AS BIGINT) AS epochs_hit
    FROM probes LEFT JOIN mm USING (probe_key)
    ORDER BY probe_key
    """,
    doc="DynamicBloomFilter semantics (util/bloom/DynamicBloomFilter"
        ".java): the order-key stream fills a NEW bloom filter every nr="
        f"{_DBF_NR} keys (epochs via the two-phase total-order rank — no "
        "single-partition window), membership ORs across the filter "
        "list. Bits are <= n_epochs*m rows, broadcast at probe time; "
        "epochs_hit exposes the growth behavior the static filter lacks.",
    tags=("agg", "sketch", "bloom"),
)
def dynamic_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops import bloom as B
    orders = load_table(spark, sf_dir, "orders")
    key = F.concat(F.lit("o_"), F.col("o_orderkey").cast("string"))
    ins = orders.select(key.alias("key"), "o_orderkey")
    bits = B.dynamic_bloom_bits(ins, "key", "o_orderkey",
                                _DBF_NR, _DBF_M, _DBF_K)
    probes = (orders.filter(F.col("o_orderkey") % 97 == 0)
                    .select(key.alias("probe_key"))
              .unionByName(spark.range(0, 16).select(
                  F.concat(F.lit("ghost_"), F.col("id").cast("string"))
                   .alias("probe_key"))))
    return (B.dynamic_membership(bits, probes, "probe_key",
                                 _DBF_M, _DBF_K)
             .orderBy("probe_key"))


@register(
    "retouched_bloom",
    sql=f"""
    WITH ins AS (
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS key FROM documents
    ), cells AS (
        SELECT key,
               ('0x' || substring(md5('bloom|' || key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_CBF_M} AS pos
        FROM ins, LATERAL (SELECT unnest(range(0, {_CBF_K})) AS i) t
    ), grid AS (
        SELECT pos, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY pos
    ), fps AS (
        SELECT 'ghost_' || CAST(x AS VARCHAR) AS fk
        FROM generate_series(0, 15) s(x)
    ), fpc AS (
        SELECT fk,
               ('0x' || substring(md5('bloom|' || fk || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_CBF_M} AS pos
        FROM fps, LATERAL (SELECT unnest(range(0, {_CBF_K})) AS i) t
    ), pick AS (
        SELECT fk, pos,
               row_number() OVER (PARTITION BY fk
                                  ORDER BY COALESCE(cnt, 0), pos) AS rn
        FROM fpc LEFT JOIN grid USING (pos)
    ), cleared AS (
        SELECT DISTINCT pos FROM pick WHERE rn = 1
    ), ret AS (
        SELECT pos, cnt FROM grid
        WHERE pos NOT IN (SELECT pos FROM cleared)
    ), probes AS (
        SELECT 'doc_' || CAST(x AS VARCHAR) AS probe_key
        FROM generate_series(0, 63) s(x)
        UNION ALL SELECT fk FROM fps
    ), pc AS (
        SELECT probe_key,
               ('0x' || substring(md5('bloom|' || probe_key || '|'
                                      || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
                   % {_CBF_M} AS pos
        FROM probes, LATERAL (SELECT unnest(range(0, {_CBF_K})) AS i) t
    ), mm AS (
        SELECT probe_key,
               min(COALESCE(g.cnt, 0)) AS c0,
               min(COALESCE(r.cnt, 0)) AS c1
        FROM pc
        LEFT JOIN grid g USING (pos)
        LEFT JOIN ret r ON r.pos = pc.pos
        GROUP BY probe_key
    )
    SELECT probe_key,
           CAST(c0 >= 1 AS BIGINT) AS member_before,
           CAST(c1 >= 1 AS BIGINT) AS member_after
    FROM mm ORDER BY probe_key
    """,
    doc="RetouchedBloomFilter semantics (util/bloom/RetouchedBloomFilter"
        ".java): for each of 16 known-false-positive ghost keys, clear "
        "its minimum-usage cell (ties: lowest pos — the minimum-ratio "
        "selection), trading bounded false negatives for the FPs. "
        "Output: per probe key, membership before vs after the retouch; "
        "the oracle replicates the argmin clearing cell-for-cell. "
        "ops/bloom.retouch_grid.",
    tags=("agg", "sketch", "bloom"),
)
def retouched_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops import bloom as B
    docs = load_table(spark, sf_dir, "documents")
    adds = docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("key"))
    grid = B.counting_grid(adds, "key", _CBF_M, _CBF_K)
    fps = spark.range(0, 16).select(
        F.concat(F.lit("ghost_"), F.col("id").cast("string")).alias("key"))
    ret = B.retouch_grid(grid, adds, fps, "key", _CBF_M, _CBF_K)
    probes = (spark.range(0, 64)
              .select(F.concat(F.lit("doc_"), F.col("id").cast("string"))
                       .alias("probe_key"))
              .unionByName(fps.withColumnRenamed("key", "probe_key")))
    before = (B.counting_membership(grid, probes, "probe_key",
                                    _CBF_M, _CBF_K)
               .select("probe_key", F.col("member").alias("member_before")))
    after = (B.counting_membership(ret, probes, "probe_key",
                                   _CBF_M, _CBF_K)
              .select("probe_key", F.col("member").alias("member_after")))
    return before.join(after, "probe_key").orderBy("probe_key")


EQD_BUCKETS = 10


@register(
    "equidepth_histogram",
    sql=f"""
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem
    ), nrows AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM c
    ), h AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY cents
    ), ps AS (
        SELECT cents, CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
        FROM h
    ), thr AS (
        SELECT i, ((i * n) + {EQD_BUCKETS - 1}) // {EQD_BUCKETS} AS t
        FROM (SELECT unnest(range(1, {EQD_BUCKETS})) AS i) js
        CROSS JOIN nrows
    ), bnd AS (
        SELECT i, min(cents) AS b FROM ps JOIN thr ON ps.cum >= thr.t
        GROUP BY i
    ), hb AS (
        SELECT h.cents, h.cnt,
               1 + count(bnd.b) AS bucket
        FROM h LEFT JOIN bnd ON h.cents > bnd.b
        GROUP BY h.cents, h.cnt
    )
    SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n_rows,
           min(cents) AS lo_cents, max(cents) AS hi_cents
    FROM hb GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-DEPTH histogram over l_extendedprice (the CBO range-"
        "selectivity statistic; equi-width twin is value_histogram, "
        "rank-per-ROW sibling is equi_depth_bins — which pays a "
        "global rank of every row for exactly-n/k buckets, where "
        "this variant costs only O(distinct values) and puts tie "
        "mass in the lower bucket), histogram-based and fully "
        "distributed: decile boundaries are the "
        "smallest values whose CUMULATIVE COUNT crosses ceil(i*n/10), "
        "computed from a per-value count histogram + the TeraSort-"
        "style two-phase prefix sum (ops/sort.total_order_prefix_sum "
        "— range-partitioned, NO single-partition window, NO exact-"
        "percentile buffer holding every value: the first draft used "
        "percentile() and cost 46 s at sf1 in one all-values "
        "aggregation buffer; this form runs on the DISTINCT-value "
        "histogram, orders of magnitude smaller than the data). "
        "Integer-only rank arithmetic — no interpolation, no floats, "
        "engine-portable by construction. Boundary-tied rows go to "
        "the lower bucket; a value spanning multiple deciles leaves "
        "the swallowed buckets EMPTY (correct, and identical in both "
        "engines).",
    tags=("agg", "quantile"),
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sort import total_order_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
                   .alias("cents"))
    h = c.groupBy("cents").agg(F.count("*").cast("long").alias("cnt"))
    ps = total_order_prefix_sum(h, "cnt", "cents", out_col="cum")
    nrows = c.agg(F.count("*").cast("long").alias("n"))
    thr = (spark.range(1, EQD_BUCKETS)
                .select(F.col("id").alias("i"))
                .crossJoin(F.broadcast(nrows))
                .select("i", F.expr(f"((i * n) + {EQD_BUCKETS - 1}) "
                                    f"div {EQD_BUCKETS}").alias("t")))
    bnd = (ps.join(F.broadcast(thr), F.col("cum") >= F.col("t"))
             .groupBy("i").agg(F.min("cents").alias("b")))
    hb = (h.join(F.broadcast(bnd), F.col("cents") > F.col("b"), "left")
           .groupBy("cents", "cnt")
           .agg((F.count("b") + 1).cast("int").alias("bucket")))
    return (hb.groupBy("bucket")
              .agg(F.sum("cnt").cast("long").alias("n_rows"),
                   F.min("cents").alias("lo_cents"),
                   F.max("cents").alias("hi_cents"))
              .orderBy("bucket"))


from hops_spark.ops.sketch import DEPTH as CMSQ_DEPTH  # noqa: E402
from hops_spark.ops.sketch import WIDTH as CMSQ_WIDTH  # noqa: E402

CMSQ_MIN_LEVEL = 16            # boundary resolution 2^16 cents
CMSQ_BITS = 24                 # value domain [0, 2^24) cents
CMSQ_RES = 1 << CMSQ_MIN_LEVEL
CMSQ_LEVELS = CMSQ_BITS - CMSQ_MIN_LEVEL
CMSQ_TARGETS = (250000, 500000, 750000, 900000)


@register(
    "cms_quantiles",
    sql=f"""
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
        FROM lineitem
    ), lvls AS (
        SELECT unnest(range({CMSQ_MIN_LEVEL}, {CMSQ_BITS})) AS l
    ), rows_ AS (
        SELECT unnest([{", ".join(str(r) for r in range(CMSQ_DEPTH))}]) AS r
    ), kh AS (
        -- per-level key histogram FIRST (integer-only), then one md5
        -- per distinct key, nibble-split into the 4 row buckets —
        -- mirrors ops/sketch.dyadic_cms_cells' build order
        SELECT l, v // CAST(pow(2.0, l) AS BIGINT) AS key,
               CAST(count(*) AS BIGINT) AS cnt
        FROM c CROSS JOIN lvls
        GROUP BY 1, 2
    ), cells AS (
        SELECT l AS level, r,
               ('0x' || substring(md5(CAST(l AS VARCHAR) || ':'
                   || CAST(key AS VARCHAR)), 7 * r + 1, 7))::BIGINT
                 % {CMSQ_WIDTH} AS bucket,
               CAST(sum(cnt) AS BIGINT) AS c
        FROM kh CROSS JOIN rows_
        GROUP BY 1, 2, 3
    ), panel AS (
        SELECT CAST(j * {CMSQ_RES} AS BIGINT) AS t
        FROM (SELECT unnest(range(1, 256)) AS j)
    ), probe AS (
        SELECT t, l, t // CAST(pow(2.0, l) AS BIGINT) - 1 AS key
        FROM panel CROSS JOIN lvls
        WHERE t // CAST(pow(2.0, l) AS BIGINT) % 2 = 1
    ), pb AS (
        SELECT t, l, r,
               ('0x' || substring(md5(CAST(l AS VARCHAR) || ':'
                   || CAST(key AS VARCHAR)), 7 * r + 1, 7))::BIGINT
                 % {CMSQ_WIDTH} AS bucket
        FROM probe CROSS JOIN rows_
    ), perlvl AS (
        SELECT pb.t, pb.l, min(coalesce(cells.c, 0)) AS e
        FROM pb LEFT JOIN cells
          ON cells.level = pb.l AND cells.r = pb.r
         AND cells.bucket = pb.bucket
        GROUP BY pb.t, pb.l
    ), ranks AS (
        SELECT t, CAST(sum(e) AS BIGINT) AS est_rank FROM perlvl GROUP BY t
    ), vhist AS (
        SELECT v // {CMSQ_RES} AS j, count(*) AS cnt FROM c GROUP BY 1
    ), exact AS (
        SELECT p.t, CAST(coalesce(sum(vhist.cnt), 0) AS BIGINT) AS exact_rank
        FROM panel p LEFT JOIN vhist ON vhist.j < p.t // {CMSQ_RES}
        GROUP BY p.t
    ), nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM c
    ), tgt AS (
        SELECT CAST(q_ppm AS BIGINT) AS q_ppm,
               greatest(1, (q_ppm * n) // 1000000) AS target_rank, n
        FROM (SELECT unnest([{", ".join(map(str, CMSQ_TARGETS))}]) AS q_ppm)
        CROSS JOIN nn
    ), crossing AS (
        SELECT q_ppm, target_rank, n, min(t) AS boundary_cents
        FROM ranks JOIN tgt ON ranks.est_rank >= tgt.target_rank
        GROUP BY 1, 2, 3
    )
    SELECT q_ppm, boundary_cents, r.est_rank, e.exact_rank,
           r.est_rank >= e.exact_rank AS never_underestimates,
           r.est_rank - e.exact_rank
             <= ({CMSQ_LEVELS} * 3 * n) // {CMSQ_WIDTH} AS within_eps
    FROM crossing
    JOIN ranks r ON r.t = boundary_cents
    JOIN exact e ON e.t = boundary_cents
    ORDER BY q_ppm
    """,
    doc="Quantiles from the dyadic-CMS sketch (Cormode & Muthukrishnan "
        "2005 §4.3 range queries — ops/sketch.dyadic_cms_cells): one "
        "4x256 CMS per dyadic level 16..23 of the cents domain "
        "(8 levels = 8192-cell bounded state, merge law = cell-wise "
        "sum, property-tested with the other six sketch families), "
        "rank(t) = sum of point estimates over the <= 8 dyadic "
        "intervals of [0, t), quantile = first 2^16-cent boundary "
        "whose estimated rank crosses ceil-free (q*n) div 1e6. Unlike "
        "equidepth_histogram (exact, O(distinct values) shuffle) this "
        "answers from a summary that never re-scans history — the "
        "streaming/incremental quantile path. Both C&M bounds ride as "
        "checked booleans: never_underestimates (sums of "
        "overestimates) and within_eps (levels * eN). The oracle "
        "rebuilds the identical grid hash-for-hash.",
    tags=("agg", "quantile", "approx", "north-star"),
)
def cms_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sketch import (dyadic_cms_cells,
                                       dyadic_rank_estimates)
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
                   .alias("v"))
    cells = dyadic_cms_cells(c, "v", CMSQ_BITS, CMSQ_MIN_LEVEL)
    panel = (spark.range(1, 256)
                  .select((F.col("id") * CMSQ_RES).alias("t")))
    ranks = dyadic_rank_estimates(cells, panel, CMSQ_BITS, CMSQ_MIN_LEVEL)
    vhist = (c.groupBy(F.expr(f"v div {CMSQ_RES}").alias("j"))
              .agg(F.count("*").alias("cnt")))
    exact = (panel.join(F.broadcast(vhist),
                        F.col("j") < F.expr(f"t div {CMSQ_RES}"), "left")
                  .groupBy("t")
                  .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long")
                        .alias("exact_rank")))
    nn = c.agg(F.count("*").cast("long").alias("n"))
    tgt = (spark.createDataFrame([(q,) for q in CMSQ_TARGETS],
                                 "q_ppm bigint")
                .crossJoin(F.broadcast(nn))
                .select("q_ppm",
                        F.expr("greatest(1, (q_ppm * n) div 1000000)")
                         .alias("target_rank"), "n"))
    crossing = (ranks.join(F.broadcast(tgt),
                           F.col("est_rank") >= F.col("target_rank"))
                     .groupBy("q_ppm", "target_rank", "n")
                     .agg(F.min("t").alias("boundary_cents")))
    return (crossing
            .join(ranks.withColumnRenamed("t", "boundary_cents"),
                  "boundary_cents")
            .join(exact.withColumnRenamed("t", "boundary_cents"),
                  "boundary_cents")
            .select("q_ppm", "boundary_cents", "est_rank", "exact_rank",
                    (F.col("est_rank") >= F.col("exact_rank"))
                    .alias("never_underestimates"),
                    (F.col("est_rank") - F.col("exact_rank")
                     <= F.expr(f"({CMSQ_LEVELS} * 3 * n) div {CMSQ_WIDTH}"))
                    .alias("within_eps"))
            .orderBy("q_ppm"))


# --- Misra–Gries heavy hitters (mergeable summary) -----------------------

MG_K = 16
MG_SHARDS = 8

# Deterministic SKEWED stream derived from lineitem (the fixtures are
# uniform by construction, so heavy hitters are synthesized the same
# way the celebrity-skew stress tier does): rows with l_orderkey % 16
# = 0 (~1/16 of the stream) spread over the ~2k-part tail key
# 'p<partkey>', everything else concentrates on the four hot keys
# 'h0'..'h3' (~19-25% of the stream each — far above the n/(k+1)
# heaviness threshold of ~5.9% at k=16).
_MG_TERM = ("CASE WHEN l_orderkey % 16 = 0 "
            "THEN concat('p', CAST(l_partkey AS STRING)) "
            "ELSE concat('h', CAST(l_orderkey % 4 AS STRING)) END")
_MG_SHARD = ("CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), "
             "':', CAST(l_linenumber AS STRING))), 1, 7), 16, 10) "
             f"AS BIGINT) % {MG_SHARDS}")


def _duck_mg_ctes(k: int, n_shards: int) -> str:
    """CTE chain rebuilding ops/sketch.mg_sharded_summary: per-shard
    histogram, truncation, then the unrolled binary merge tree."""
    term = _MG_TERM.replace("AS STRING", "AS VARCHAR")
    shard = (f"(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || ':' "
             f"|| CAST(l_linenumber AS VARCHAR)), 1, 7))::BIGINT) "
             f"% {n_shards}")
    parts = [f"""stream AS (
        SELECT {term} AS term, {shard} AS shard FROM lineitem
    ), h0 AS (
        SELECT shard, term, CAST(count(*) AS BIGINT) AS c
        FROM stream GROUP BY 1, 2
    )"""]
    src = "h0"
    rounds = 0
    n = n_shards
    while n >= 1:
        i = rounds
        parts.append(f"""r{i} AS (
        SELECT shard, term, c,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY c DESC, term) AS rn
        FROM {src}
    ), cp{i} AS (
        SELECT shard, max(CASE WHEN rn = {k + 1} THEN c ELSE 0 END) AS cp
        FROM r{i} GROUP BY shard
    ), t{i} AS (
        SELECT r{i}.shard, term, c - cp AS c
        FROM r{i} JOIN cp{i} USING (shard) WHERE c - cp > 0
    )""")
        if n == 1:
            break
        n //= 2
        rounds += 1
        parts.append(f"""m{rounds} AS (
        SELECT shard // 2 AS shard, term, CAST(sum(c) AS BIGINT) AS c
        FROM t{rounds - 1} GROUP BY 1, 2
    )""")
        src = f"m{rounds}"
    return ",\n    ".join(parts), f"t{rounds}"


_MG_CTES, _MG_FINAL = _duck_mg_ctes(MG_K, MG_SHARDS)


@register(
    "mg_heavy_hitters",
    sql=f"""
    WITH {_MG_CTES}, exact AS (
        SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM stream
        GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total FROM stream
    )
    SELECT e.term, e.n_exact,
           CAST(coalesce(s.c, 0) AS BIGINT) AS est_mg,
           e.n_exact * {MG_K + 1} > t.n_total AS is_heavy,
           coalesce(s.c, 0) <= e.n_exact AS underestimates,
           e.n_exact - coalesce(s.c, 0) <= t.n_total // {MG_K + 1}
               AS within_bound,
           (NOT e.n_exact * {MG_K + 1} > t.n_total)
               OR coalesce(s.c, 0) > 0 AS covered_if_heavy
    FROM exact e CROSS JOIN tot t
    LEFT JOIN {_MG_FINAL} s USING (term)
    WHERE coalesce(s.c, 0) > 0 OR e.n_exact * {MG_K + 1} > t.n_total
    ORDER BY e.n_exact DESC, e.term
    """,
    doc="Misra–Gries heavy hitters as a MERGEABLE summary (Misra & "
        "Gries 1982; merge rule and the n/(k+1) telescoping bound from "
        "Agarwal et al. 2012 'Mergeable summaries' §3.1) — the "
        "deterministic counter-based sibling of the CMS heavy_hitters "
        "query: no hashing, no overestimates, a hard ≤ k counters of "
        "state. Per-shard exact key histograms (the one data-"
        "proportional aggregate, map-side combined) truncate to MG(k) "
        "and merge up a log2(shards) binary tree (sum + truncate, each "
        "round ≤ shards × k rows — metadata-sized). Both guarantee "
        "directions ride as checked booleans: estimates never exceed "
        "truth, undercount ≤ n div (k+1), and every item heavier than "
        "n/(k+1) SURVIVES (covered_if_heavy). The skewed stream is "
        "derived deterministically from lineitem (fixture device — see "
        "_MG_TERM). ops/sketch.mg_sharded_summary; oracle rebuilds the "
        "identical merge tree counter-for-counter.",
    tags=("agg", "sketch", "approx"),
)
def mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sketch import mg_sharded_summary

    li = load_table(spark, sf_dir, "lineitem")
    stream = li.select(F.expr(_MG_TERM).alias("term"),
                       F.expr(_MG_SHARD).alias("shard"))
    summ = (mg_sharded_summary(stream, "term", "shard",
                               MG_SHARDS, MG_K)
            .withColumnRenamed("c", "est_mg"))
    exact = stream.groupBy("term").agg(F.count("*").cast("long")
                                        .alias("n_exact"))
    tot = stream.agg(F.count("*").cast("long").alias("n_total"))
    bound = F.expr(f"n_total div {MG_K + 1}")
    heavy = F.col("n_exact") * (MG_K + 1) > F.col("n_total")
    est = F.coalesce("est_mg", F.lit(0)).cast("long")
    return (exact.join(F.broadcast(summ), "term", "left")
                 .crossJoin(F.broadcast(tot))
                 .filter((est > 0) | heavy)
                 .select("term", "n_exact", est.alias("est_mg"),
                         heavy.alias("is_heavy"),
                         (est <= F.col("n_exact")).alias("underestimates"),
                         (F.col("n_exact") - est <= bound)
                         .alias("within_bound"),
                         (~heavy | (est > 0)).alias("covered_if_heavy"))
                 .orderBy(F.col("n_exact").desc(), "term"))
