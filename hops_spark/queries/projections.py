"""Projection / row-transform inventory queries (SURVEY.md §2.2, §2.7):
wordcount (TokenCounterMapper), grep (RegexMapper), field selection
(FieldSelectionMapper), inverse map, scan sampling filters, json
extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import filter_percent, load_table
from hops_spark.ops.project import field_select, regex_extract_rows, tokenize
from hops_spark.registry import register


@register(
    "wordcount",
    sql="""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 100
    """,
    doc="WordCount — TokenCounterMapper + IntSumReducer "
        "(reference TokenCounterMapper.java:35, examples/WordCount).",
    tags=("project", "agg", "text", "flagship"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(F.lower("text").alias("text"))
    return (tokenize(d, "text", out="word")
            .groupBy("word").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("word"))
            .limit(100))


@register(
    "grep",
    sql="""
    WITH m AS (
        SELECT unnest(regexp_extract_all(text, '[a-z]+ing')) AS match
        FROM documents
    )
    SELECT match, count(*) AS cnt
    FROM m WHERE match <> ''
    GROUP BY match
    ORDER BY cnt DESC, match
    LIMIT 20
    """,
    doc="Grep example — RegexMapper + sum + sort-by-count "
        "(reference examples/Grep.java:55-90, RegexMapper.java:36).",
    tags=("project", "text"),
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (regex_extract_rows(d, "text", r"[a-z]+ing", 0, out="match")
            .groupBy("match").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("match"))
            .limit(20))


@register(
    "field_selection",
    sql="""
    WITH lines AS (
        SELECT concat_ws('\t', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                         CAST(o_totalprice AS VARCHAR), o_orderpriority,
                         CAST(o_custkey AS VARCHAR)) AS line
        FROM orders
    ), f AS (
        SELECT string_split(line, '\t') AS fs FROM lines
    )
    SELECT concat_ws('\t', fs[2]) AS key,
           concat_ws('\t', fs[4], fs[5], fs[1]) AS value
    FROM f
    ORDER BY key, value
    LIMIT 200
    """,
    doc="FieldSelectionMapper: unix-cut spec '1' (key) / '3-4,0' (value) over "
        "tab-joined lines (reference FieldSelectionMapper.java:34-61).",
    tags=("project",),
)
def field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    lines = o.select(F.concat_ws("\t",
                                 F.col("o_orderkey").cast("string"),
                                 F.col("o_orderstatus"),
                                 F.col("o_totalprice").cast("string"),
                                 F.col("o_orderpriority"),
                                 F.col("o_custkey").cast("string")).alias("line"))
    return (field_select(lines, "line", key_spec="1", value_spec="3-4,0")
            .orderBy("key", "value").limit(200))


@register(
    "inverse_map",
    sql="""
    SELECT n_name AS key, n_nationkey AS value
    FROM nation
    ORDER BY key
    """,
    doc="InverseMapper: (k,v) → (v,k) (reference InverseMapper.java:30).",
    tags=("project",),
)
def inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("value"))
    from hops_spark.ops.project import inverse
    return inverse(n).orderBy("key")


@register(
    "scan_percent_filter",
    sql="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) = '0'
    ORDER BY o_orderkey
    """,
    doc="PercentFilter/MD5Filter pushed-down sampling scan — keep keys whose "
        "md5 bucket is 0 (1/16 sample; reference "
        "SequenceFileInputFilter.java:154,203). The murmur3 variant "
        "(filter_percent) is exercised in unit tests; md5 here because Spark "
        "and DuckDB share md5 but not murmur3.",
    tags=("scan", "filter"),
)
def scan_percent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    _ = filter_percent  # murmur3 variant exercised in unit tests
    return (o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 32, 1) == "0")
             .select("o_orderkey", "o_custkey").orderBy("o_orderkey"))


@register(
    "json_extract_events",
    sql="""
    SELECT event_type,
           CAST(sum(TRY_CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction over events.props — superset scalar surface "
        "(SURVEY §2.7 JSON row; reference carries nested data only via "
        "typedbytes).",
    tags=("project", "json", "superset"),
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (e.select("event_type",
                     F.get_json_object("props", "$.k").cast("bigint").alias("k"))
             .groupBy("event_type")
             .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
             .orderBy("event_type"))
