"""Scan-filter / heterogeneous-input / scalar-hash / generator
inventory queries (SURVEY.md §2.1, §2.2, §2.7, §2.10).

Covers the pushed-down sampling scans of SequenceFileInputFilter
(RegexFilter / MD5Filter, mapreduce/lib/input/SequenceFileInputFilter.java:111,203),
the MultipleInputs heterogeneous union (MultipleInputs.java:40), the
NLineInputFormat split arithmetic (NLineInputFormat.java:61), the
ChainMapper fused narrow chain (chain/ChainMapper.java:84), the
MD5Hash scalar surface (io/MD5Hash.java), and TeraGen + total-order
sort (examples/terasort/TeraGen.java:68, Sort.java:57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops.gen import teragen
from hops_spark.registry import register


@register(
    "scan_regex_filter",
    sql="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS key, n_chars
    FROM documents
    WHERE regexp_matches('doc_' || CAST(doc_id AS VARCHAR), '^doc_[0-9]*[02468]$')
    ORDER BY doc_id
    """,
    doc="SequenceFileInputFilter.RegexFilter "
        "(SequenceFileInputFilter.java:111): keep records whose key "
        "matches a regex — a filter Catalyst pushes into the scan.",
    tags=("scan", "filter"),
)
def scan_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    return (d.select(key.alias("key"), "n_chars", "doc_id")
             .filter(F.col("key").rlike("^doc_[0-9]*[02468]$"))
             .orderBy("doc_id")
             .drop("doc_id"))


@register(
    "scan_md5_filter",
    sql="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE ('0x' || substring(md5('doc_' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 16 = 0
    ORDER BY doc_id
    """,
    doc="SequenceFileInputFilter.MD5Filter "
        "(SequenceFileInputFilter.java:203): deterministic 1-in-f "
        "sampling by md5(key) bucket — unlike df.sample(), the same "
        "rows are kept on every engine and every run.",
    tags=("scan", "filter", "sampling"),
)
def scan_md5_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    bucket = F.pmod(F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long"), F.lit(16))
    return (d.filter(bucket == 0)
             .select("doc_id", "n_chars")
             .orderBy("doc_id"))


@register(
    "scan_nline_splits",
    sql="""
    SELECT doc_id // 100 AS split_id, count(*) AS n_records,
           min(doc_id) AS first_rec, max(doc_id) AS last_rec
    FROM documents
    GROUP BY split_id
    ORDER BY split_id
    """,
    doc="NLineInputFormat (NLineInputFormat.java:61): N records per "
        "split — the split arithmetic as a query (Spark-side "
        "parallelism control is repartition/maxRecordsPerFile).",
    tags=("scan",),
)
def scan_nline_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy((F.col("doc_id") / 100).cast("long").alias("split_id"))
             .agg(F.count("*").alias("n_records"),
                  F.min("doc_id").alias("first_rec"),
                  F.max("doc_id").alias("last_rec"))
             .orderBy("split_id"))


@register(
    "multi_input_union",
    sql="""
    SELECT entity, count(*) AS n, round(sum(acctbal), 2) AS total_bal,
           round(avg(acctbal), 4) AS avg_bal
    FROM (
        SELECT 'customer' AS entity, c_nationkey AS nationkey, c_acctbal AS acctbal
        FROM customer
        UNION ALL
        SELECT 'supplier' AS entity, s_nationkey AS nationkey, s_acctbal AS acctbal
        FROM supplier
    )
    GROUP BY entity
    ORDER BY entity
    """,
    doc="MultipleInputs + DelegatingMapper (MultipleInputs.java:40): "
        "heterogeneous sources mapped per-source into a common schema, "
        "then processed as one — unionByName after per-source select.",
    tags=("scan", "union"),
)
def multi_input_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .select(F.lit("customer").alias("entity"),
                 F.col("c_nationkey").alias("nationkey"),
                 F.col("c_acctbal").alias("acctbal")))
    s = (load_table(spark, sf_dir, "supplier")
         .select(F.lit("supplier").alias("entity"),
                 F.col("s_nationkey").alias("nationkey"),
                 F.col("s_acctbal").alias("acctbal")))
    return (c.unionByName(s)
             .groupBy("entity")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("acctbal"), 2).alias("total_bal"),
                  F.round(F.avg("acctbal"), 4).alias("avg_bal"))
             .orderBy("entity"))


@register(
    "hash_surface",
    sql="""
    SELECT substring(md5(text), 1, 1) AS md5_nibble,
           count(*) AS n,
           min(substring(sha256(text), 1, 8)) AS min_sha8
    FROM documents
    GROUP BY md5_nibble
    ORDER BY md5_nibble
    """,
    doc="Scalar hash surface (io/MD5Hash.java; util/hash/*): md5 + "
        "sha2 over document text, grouped by leading nibble — checks "
        "byte-identical digests across engines. (murmur3 `hash()` and "
        "`xxhash64()` are Spark-only seeds: used in salting helpers, "
        "not oracle-checked.)",
    tags=("function", "hash"),
)
def hash_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.substring(F.md5("text"), 1, 1).alias("md5_nibble"),
                     F.substring(F.sha2("text", 256), 1, 8).alias("sha8"))
             .groupBy("md5_nibble")
             .agg(F.count("*").alias("n"), F.min("sha8").alias("min_sha8"))
             .orderBy("md5_nibble"))


@register(
    "chain_map_reduce",
    sql="""
    SELECT w AS word, count(*) AS n
    FROM (
        SELECT unnest(list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                   x -> len(x) > 3)) AS w
        FROM documents
        WHERE lang = 'en'
    )
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="ChainMapper/ChainReducer (chain/ChainMapper.java:84): "
        "filter → normalize → tokenize → filter → count as ONE fused "
        "narrow chain before the single shuffle — whole-stage codegen "
        "is the Spark realization of the no-materialization chain.",
    tags=("project", "chain", "agg"),
)
def chain_map_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")
    toks = F.filter(F.split(cleaned, " "),
                    lambda w: F.length(w) > 3)
    return (d.filter(F.col("lang") == "en")
             .select(F.explode(toks).alias("word"))
             .groupBy("word")
             .agg(F.count("*").alias("n"))
             .orderBy(F.col("n").desc(), F.col("word"))
             .limit(20))


@register(
    "teragen_sorted",
    sql="""
    SELECT substring(md5('42|' || CAST(id AS VARCHAR)), 1, 10) AS key,
           id AS row_id
    FROM generate_series(0, 9999) AS t(id)
    ORDER BY key
    LIMIT 100
    """,
    doc="TeraGen + total-order sort (terasort/TeraGen.java:68, "
        "examples/Sort.java:57): deterministic generator keyed on "
        "(seed, row-id) — identical output at any parallelism — fed "
        "into a range-partitioned global sort. The reference needed "
        "TotalOrderPartitioner + InputSampler; Spark's orderBy samples "
        "and range-partitions internally.",
    tags=("generator", "sort"),
)
def teragen_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = teragen(spark, 10_000, seed=42)
    return (g.select("key", "row_id")
             .orderBy("key")
             .limit(100))


@register(
    "dictionary_encode",
    sql="""
    SELECT p_brand,
           row_number() OVER (ORDER BY p_brand) AS surrogate_id,
           n_parts
    FROM (SELECT p_brand, count(*) AS n_parts FROM part GROUP BY p_brand)
    ORDER BY surrogate_id
    """,
    doc="SetFile/ArrayFile parity (io/SetFile.java, io/ArrayFile.java): "
        "distinct-key table with a dense long-indexed surrogate — "
        "dictionary encoding. The surrogate comes from the two-phase "
        "total_order_rank (no single-partition window), the standard "
        "zipWithIndex replacement at scale.",
    tags=("scan", "setop", "sort"),
)
def dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sort import total_order_rank
    p = load_table(spark, sf_dir, "part")
    distinct = p.groupBy("p_brand").agg(F.count("*").alias("n_parts"))
    return (total_order_rank(distinct, "p_brand", rank_col="surrogate_id")
            .select("p_brand", "surrogate_id", "n_parts")
            .orderBy("surrogate_id"))


@register(
    "teravalidate",
    sql="""
    WITH g AS (
        SELECT substring(md5('42|' || CAST(id AS VARCHAR)), 1, 10) AS key
        FROM generate_series(0, 9999) AS t(id)
    )
    SELECT count(*) AS n_rows,
           CAST(0 AS BIGINT) AS n_misordered,
           min(key) AS first_key,
           max(key) AS last_key,
           CAST(sum(('0x' || substring(md5(key), 1, 15))::BIGINT
                    % 1000000000) AS BIGINT) AS checksum
    FROM g
    """,
    doc="TeraValidate (terasort/TeraValidate.java): per-partition order "
        "scan + cross-partition boundary check + order-invariant global "
        "checksum over the sorted TeraGen output. The oracle pins "
        "n_misordered = 0 — Spark must actually produce a correctly "
        "sorted dataset — plus the exact checksum/extrema.",
    tags=("generator", "sort", "validate"),
)
def teravalidate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.gen import teragen, teravalidate
    g = teragen(spark, 10_000, seed=42)
    return teravalidate(g.select("key"), "key")


def _duck_words_literal() -> str:
    from hops_spark.ops.gen import WORDS
    return "[" + ", ".join(f"'{w}'" for w in WORDS) + "]"


def _n_words() -> int:
    from hops_spark.ops.gen import WORDS
    return len(WORDS)


@register(
    "random_text_topwords",
    sql=f"""
    WITH rows_g AS (
        SELECT id FROM generate_series(0, 1999) AS t(id)
    ), toks AS (
        SELECT {_duck_words_literal()}[
            CAST(('0x' || substring(md5('42|' || CAST(id AS VARCHAR)
                                        || '|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                 % {_n_words()} AS INT) + 1] AS word
        FROM rows_g, (SELECT unnest(range(0, 10)) AS i)
    )
    SELECT word, count(*) AS n
    FROM toks
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="RandomTextWriter (examples/RandomTextWriter.java) + wordcount: "
        "deterministic md5-mixed draws from the 100-word table — "
        "identical corpus at any parallelism, verified by recomputing "
        "the generator relationally and counting the same words.",
    tags=("generator", "text"),
)
def random_text_topwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.gen import random_text_writer
    g = random_text_writer(spark, 2000, words_per_row=10, seed=42)
    return (g.select(F.explode(F.split("text", " ")).alias("word"))
             .groupBy("word").agg(F.count("*").alias("n"))
             .orderBy(F.col("n").desc(), "word")
             .limit(20))


@register(
    "random_writer_stats",
    sql="""
    WITH g AS (
        SELECT md5('42|' || CAST(id AS VARCHAR)) AS key,
               CAST(('0x' || substring(md5('42|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
                    % 91 AS INT) + 10 AS vlen
        FROM generate_series(0, 1999) AS t(id)
    )
    SELECT count(*) AS n_rows,
           count(DISTINCT key) AS n_distinct_keys,
           CAST(sum(vlen) AS BIGINT) AS total_value_bytes,
           min(key) AS first_key
    FROM g
    """,
    doc="RandomWriter (examples/RandomWriter.java): deterministic "
        "(key, variable-length value) generator — accounting query "
        "verifies the generated keys and value-length distribution "
        "against a relational recomputation.",
    tags=("generator",),
)
def random_writer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.gen import random_writer
    g = random_writer(spark, 2000, seed=42, min_value_len=10, max_value_len=100)
    return g.agg(F.count("*").alias("n_rows"),
                 F.countDistinct("key").alias("n_distinct_keys"),
                 F.sum(F.length("value")).cast("long").alias("total_value_bytes"),
                 F.min("key").alias("first_key"))


@register(
    "avro_roundtrip",
    # Oracle aggregates the SOURCE parquet directly; the Spark side
    # aggregates the avro-written-then-reread copy — hashes match iff
    # the container roundtrip (schema mapping, zigzag varints, deflate
    # blocks, timestamp-micros) is lossless.
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS max_epoch_s
    FROM orders WHERE o_orderkey % 7 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Avro object-container read/write path (the reference's schema'd "
        "serialization regime, AvroSerialization.java:44): a deterministic "
        "orders slice is written as deflate-coded avro part files (one per "
        "partition, zero shuffle) and re-read via binaryFile + Arrow "
        "mapInPandas (io/avro.py — the PUBLIC Avro spec implemented "
        "directly; Java-library interop proven in tests/test_avro.py). "
        "The aggregate over the roundtripped copy must hash-match the "
        "oracle's aggregate over the source parquet.",
    tags=("io", "scan", "serialization"),
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.io import avro as A
    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 7 == 0)
              .select("o_orderkey", "o_orderstatus", "o_totalprice",
                      "o_orderdate"))
    path = os.path.join(scratch_dir("avro_rt", sf_dir), "orders")
    A.write_avro(orders.repartition(4), path, codec="deflate")
    back = A.read_avro(spark, path)
    return (back.groupBy("o_orderstatus")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                            .cast("long")).alias("total_cents"),
                     F.min("o_orderkey").alias("min_key"),
                     F.max("o_orderkey").alias("max_key"),
                     F.max(F.unix_timestamp("o_orderdate"))
                      .alias("max_epoch_s"))
                .orderBy("o_orderstatus"))


@register(
    "avro_split_scan",
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey % 5 = 1
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Avro SYNC-SPLIT scan: the same orders slice written as ONE "
        "container file, then read with split_bytes=8192 — every task "
        "syncs to the next block marker inside its byte range "
        "(io/avro.read_container_split; the Avro split contract that "
        "lets a single 10 GB file fan out across a cluster). Hash-"
        "matching the source-parquet oracle proves the byte-range "
        "dovetail drops and doubles nothing.",
    tags=("io", "scan", "serialization"),
)
def avro_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.io import avro as A
    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 5 == 1)
              .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    path = os.path.join(scratch_dir("avro_split", sf_dir), "one")
    A.write_avro(orders.coalesce(1), path, codec="deflate")
    back = A.read_avro(spark, path, split_bytes=8192)
    return (back.groupBy("o_orderstatus")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                            .cast("long")).alias("total_cents"),
                     F.min("o_orderkey").alias("min_key"),
                     F.max("o_orderkey").alias("max_key"))
                .orderBy("o_orderstatus"))


_AVRO_EVO_READER = {
    # write_avro names the top record "topLevelRecord" (the spark-avro
    # convention); the v2 reader declares it as a record-level alias
    "type": "record", "name": "orders_v1",
    "aliases": ["topLevelRecord"], "fields": [
        {"name": "okey", "type": "long"},
        # v2 renames status -> ostatus; the alias resolves v1 data
        {"name": "ostatus", "type": ["null", "string"],
         "aliases": ["status"]},
        # v1 wrote int cents; v2 widened to long (spec promotion)
        {"name": "total_cents", "type": ["null", "long"]},
        {"name": "price", "type": ["null", {
            "type": "bytes", "logicalType": "decimal",
            "precision": 12, "scale": 2}]},
        # brand-new field: every v1 row takes the declared default
        {"name": "channel", "type": "string", "default": "web"},
    ]}


@register(
    "avro_evolution",
    sql="""
    WITH v1 AS (
        SELECT o_orderstatus AS ostatus,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 7 = 3
    )
    SELECT ostatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           round(CAST(sum(CAST(cents * 0.01 AS DECIMAL(12,2)))
                      AS DOUBLE), 2) AS sum_price,
           'web' AS channel
    FROM v1 GROUP BY ostatus ORDER BY ostatus
    """,
    doc="Avro SCHEMA RESOLUTION end-to-end (spec 'Schema Resolution'; "
        "the evolving-record contract AvroSerialization.java:44 gets "
        "from ReflectDatumReader(writer, reader)): an orders slice is "
        "written with schema v1 (status, int cents, decimal(12,2) "
        "price, a legacy field), then read with reader schema v2 — "
        "status RENAMED to ostatus via aliases, cents PROMOTED "
        "int->long, legacy DROPPED, and a new channel field filled "
        "from its default. The aggregate over the resolved rows "
        "hash-matches the oracle computed straight from the source "
        "parquet, so every resolution rule is value-proven (the "
        "decimal-field sum — an exact decimal(18,2) accumulator, cast "
        "to double and rounded only at OUTPUT, because the driver's "
        "canonicalizer cannot hash DECIMAL columns portably — "
        "additionally proves the unscaled two's-complement "
        "bytes-decimal roundtrip: a single cent of decode error moves "
        "the rounded sum). io/avro.read_resolved; Java-library "
        "equivalence in tests/test_avro.py.",
    tags=("io", "scan", "serialization"),
)
def avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.io import avro as A
    from hops_spark.session import scratch_dir

    v1 = (load_table(spark, sf_dir, "orders")
          .filter(F.col("o_orderkey") % 7 == 3)
          .select(F.col("o_orderkey").alias("okey"),
                  F.col("o_orderstatus").alias("status"),
                  F.round(F.col("o_totalprice") * 100, 0).cast("int")
                   .alias("total_cents"),
                  F.expr("CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)"
                         " * 0.01 AS DECIMAL(12,2))").alias("price"),
                  F.when(F.col("o_orderkey") % 2 == 1,
                         F.concat(F.lit("v1-"), F.col("o_orderkey")))
                   .alias("legacy")))
    path = os.path.join(scratch_dir("avro_evo", sf_dir), "orders_v1")
    A.write_avro(v1.repartition(4), path, codec="deflate")
    v2 = A.read_avro(spark, path, reader_schema=_AVRO_EVO_READER)
    return (v2.groupBy("ostatus")
              .agg(F.count("*").alias("n_orders"),
                   F.sum("total_cents").alias("sum_cents"),
                   F.round(F.sum("price").cast("decimal(18,2)")
                            .cast("double"), 2).alias("sum_price"),
                   F.max("channel").alias("channel"))
              .orderBy("ostatus"))


@register(
    "parquet_schema_evolution",
    sql="""
    WITH v1 AS (
        SELECT o_orderkey AS okey, o_orderstatus AS ostatus,
               CAST(NULL AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 11 = 0
    ), v2 AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
        FROM orders WHERE o_orderkey % 11 = 5
    ), unioned AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT ostatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(cents) AS BIGINT) AS n_with_cents,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS sum_cents
    FROM unioned GROUP BY ostatus ORDER BY ostatus
    """,
    doc="PARQUET schema evolution — the Spark-native twin of "
        "avro_evolution: batch v1 (2 columns) and batch v2 (adds a "
        "cents column) land in one dataset directory; a "
        "mergeSchema=true read unions the footers and NULL-fills the "
        "missing column for v1 rows (spark.sql.parquet.mergeSchema — "
        "the additive-column contract every long-lived 100 TB dataset "
        "relies on as its schema grows). The aggregate proves the "
        "fill: per status, total rows vs rows carrying cents vs their "
        "sum, hash-matched against the oracle computing the same "
        "two-generation union straight from the source table.",
    tags=("io", "scan", "serialization"),
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.session import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    root = scratch_dir("pq_evo", sf_dir)
    (orders.filter(F.col("o_orderkey") % 11 == 0)
           .select(F.col("o_orderkey").alias("okey"),
                   F.col("o_orderstatus").alias("ostatus"))
           .write.mode("overwrite")
           .parquet(os.path.join(root, "batch=v1")))
    (orders.filter(F.col("o_orderkey") % 11 == 5)
           .select(F.col("o_orderkey").alias("okey"),
                   F.col("o_orderstatus").alias("ostatus"),
                   F.round(F.col("o_totalprice") * 100, 0).cast("long")
                    .alias("cents"))
           .write.mode("overwrite")
           .parquet(os.path.join(root, "batch=v2")))
    evolved = (spark.read.option("mergeSchema", "true")
               .option("recursiveFileLookup", "true").parquet(root))
    return (evolved.groupBy("ostatus")
            .agg(F.count("*").alias("n_rows"),
                 F.count("cents").alias("n_with_cents"),
                 F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
                  .alias("sum_cents"))
            .orderBy("ostatus"))


@register(
    "orc_roundtrip",
    # Oracle aggregates the SOURCE parquet; the Spark side aggregates
    # an ORC-written-then-reread PARTITIONED copy — hashes match iff
    # the columnar roundtrip (types, zlib stripes, partition-column
    # reconstruction from directory keys) is lossless.
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS max_epoch_s
    FROM orders WHERE o_orderkey % 5 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="ORC read/write path (Spark built-in columnar alternative — "
        "the TFile/BCFile-era format slot in SURVEY §2.1 maps to "
        "modern columnar containers): a deterministic orders slice is "
        "written as zlib ORC PARTITIONED BY o_orderstatus "
        "(directory-keyed layout, so the partition column is "
        "reconstructed from paths on read — the layout avro_roundtrip "
        "does not exercise) and re-read; the aggregate over the "
        "roundtripped copy must hash-match the oracle's aggregate "
        "over the source parquet. Partition pruning over the "
        "status-keyed layout is what a WHERE o_orderstatus = ... scan "
        "gets for free at scale.",
    tags=("io", "scan", "serialization"),
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 5 == 0)
              .select("o_orderkey", "o_orderstatus", "o_totalprice",
                      "o_orderdate"))
    path = os.path.join(scratch_dir("orc_rt", sf_dir), "orders")
    (orders.repartition(4)
           .write.mode("overwrite")
           .partitionBy("o_orderstatus")
           .option("compression", "zlib")
           .orc(path))
    back = spark.read.orc(path)
    return (back.groupBy("o_orderstatus")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                            .cast("long")).alias("total_cents"),
                     F.min("o_orderkey").alias("min_key"),
                     F.max("o_orderkey").alias("max_key"),
                     F.max(F.unix_timestamp("o_orderdate"))
                      .alias("max_epoch_s"))
                .orderBy("o_orderstatus"))


@register(
    "csv_roundtrip",
    # Oracle derives the SAME tricky quoted value from the source
    # parquet; the Spark side writes it through the CSV writer and
    # reads it back — digests match iff RFC-4180 quoting (embedded
    # commas, embedded double-quotes doubled) roundtrips losslessly.
    sql="""
    SELECT doc_id,
           md5('a,"b' || substring(text, 1, 20) || '",c') AS tricky_digest
    FROM documents WHERE doc_id % 20 = 0
    ORDER BY doc_id
    """,
    doc="CSV write/read identity under RFC-4180 quoting (the "
        "TextOutputFormat-era delimited regime, SURVEY §2.1): a "
        "documents slice gains a value embedding commas AND double-"
        "quotes, goes through Spark's CSV writer (quote-all, "
        "double-quote escaping) and reader (explicit schema, same "
        "quote/escape options), and the per-row md5 of the "
        "roundtripped value must hash-match the oracle's digest "
        "computed directly from parquet. Embedded newlines are NOT "
        "exercised (they require multiLine=true single-threaded "
        "parsing — the documented trade: keep records newline-free "
        "upstream so CSV splits stay parallel).",
    tags=("io", "scan", "serialization"),
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.session import scratch_dir
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 20 == 0)
         .select("doc_id",
                 F.concat(F.lit('a,"b'), F.substring("text", 1, 20),
                          F.lit('",c')).alias("tricky")))
    path = os.path.join(scratch_dir("csv_rt", sf_dir), "docs")
    (d.repartition(4).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("quote", '"').option("escape", '"')
      .csv(path))
    back = (spark.read.schema("doc_id long, tricky string")
                 .option("header", "true")
                 .option("quote", '"').option("escape", '"')
                 .csv(path))
    return (back.select("doc_id", F.md5("tricky").alias("tricky_digest"))
                .orderBy("doc_id"))


@register(
    "jsonl_roundtrip",
    # Oracle aggregates the SOURCE parquet; the Spark side aggregates a
    # JSON-lines-written-then-reread copy — hashes match iff the JSON
    # writer/reader pair preserves types (bigint, double, string with
    # quotes/unicode, timestamp) losslessly.
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS max_epoch_s,
           md5(string_agg(md5('q"' || o_orderpriority || '€'),
                          '' ORDER BY o_orderkey)) AS strings_digest
    FROM orders WHERE o_orderkey % 11 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="JSON-lines write/read identity (the newline-delimited "
        "interchange format every ingest pipeline meets): a "
        "deterministic orders slice gains a string with an embedded "
        "double-quote and a non-ASCII character, goes through Spark's "
        "JSON writer and schema'd reader, and the per-status "
        "aggregates — including an order-fixed rolling digest of "
        "every roundtripped string — must hash-match the oracle's "
        "aggregates computed directly from parquet (escape handling "
        "\\\" and unicode passthrough are what the digest certifies). "
        "Timestamps roundtrip via the default ISO format.",
    tags=("io", "scan", "serialization"),
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 11 == 0)
              .select("o_orderkey", "o_orderstatus", "o_totalprice",
                      "o_orderdate",
                      F.concat(F.lit('q"'), F.col("o_orderpriority"),
                               F.lit("€")).alias("tricky")))
    path = os.path.join(scratch_dir("jsonl_rt", sf_dir), "orders")
    orders.repartition(4).write.mode("overwrite").json(path)
    back = (spark.read
                 .schema("o_orderkey long, o_orderstatus string, "
                         "o_totalprice double, o_orderdate timestamp_ntz, "
                         "tricky string")
                 .json(path))
    return (back.groupBy("o_orderstatus")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                            .cast("long")).alias("total_cents"),
                     F.min("o_orderkey").alias("min_key"),
                     F.max("o_orderkey").alias("max_key"),
                     F.max(F.unix_timestamp("o_orderdate"))
                      .alias("max_epoch_s"),
                     F.md5(F.concat_ws(
                         "", F.array_sort(F.collect_list(F.struct(
                             F.col("o_orderkey").alias("k"),
                             F.md5("tricky").alias("h"))))
                          .getField("h")).cast("binary"))
                      .alias("strings_digest"))
                .orderBy("o_orderstatus"))


@register(
    "dynamic_partition_overwrite",
    # Oracle computes the EXPECTED post-overwrite state from parquet:
    # partition F rewritten with +10.00 on every price, all other
    # partitions untouched — exactly what dynamic partitionOverwriteMode
    # must produce (static mode would have DELETED the other partitions).
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                    + CASE WHEN o_orderstatus = 'F' THEN 1000 ELSE 0 END)
                AS BIGINT) AS total_cents
    FROM orders WHERE o_orderkey % 13 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Dynamic partition overwrite (the lakehouse partial-rewrite "
        "contract, INSERT OVERWRITE ... PARTITION semantics): a "
        "status-partitioned table is written, then ONLY partition "
        "o_orderstatus='F' is rewritten (every price +10.00) with "
        "spark.sql.sources.partitionOverwriteMode=dynamic — the mode "
        "under which an overwrite touches exactly the partitions "
        "present in the incoming data. The post-overwrite aggregate "
        "must show modified F and UNTOUCHED other partitions; under "
        "the default static mode the other partitions would have been "
        "deleted and the hash would mismatch (the contract this query "
        "certifies). Conf is set and restored around the write.",
    tags=("io", "scan", "serialization"),
)
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 13 == 0)
              .select("o_orderkey", "o_orderstatus",
                      F.round(F.col("o_totalprice") * 100, 0).cast("long")
                       .alias("cents")))
    path = os.path.join(scratch_dir("dpo", sf_dir), "orders")
    (orders.repartition(4).write.mode("overwrite")
           .partitionBy("o_orderstatus").parquet(path))
    patch = (orders.filter(F.col("o_orderstatus") == "F")
                   .withColumn("cents", F.col("cents") + 1000))
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "STATIC")
    spark.conf.set(conf_key, "dynamic")
    try:
        (patch.repartition(4).write.mode("overwrite")
              .partitionBy("o_orderstatus").parquet(path))
    finally:
        spark.conf.set(conf_key, prev)
    back = spark.read.parquet(path)
    return (back.groupBy("o_orderstatus")
                .agg(F.count("*").alias("n_orders"),
                     F.sum("cents").cast("long").alias("total_cents"))
                .orderBy("o_orderstatus"))


@register(
    "fixed_width_roundtrip",
    # Oracle aggregates the source parquet; the Spark side renders each
    # order as a FIXED-WIDTH line (12-char zero-padded key, 1-char
    # status, 12-char zero-padded cents), writes it as plain text, and
    # carves the fields back out with the FixedLengthInputFormat-parity
    # reader — hashes match iff the pad/carve roundtrip is lossless.
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey % 17 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Fixed-width text write/read identity (FixedLengthInputFormat "
        "parity, io/readers.read_fixed_width — the mainframe-era "
        "record layout SURVEY §2.1 carries): a deterministic orders "
        "slice is rendered as 25-char fixed-width lines (zero-padded "
        "key / status / zero-padded cents), written as plain text "
        "part files, carved back by column offsets, and the "
        "per-status aggregates must hash-match the oracle's parquet "
        "aggregates. Integer zero-padding makes the roundtrip exact "
        "by construction — the property the reader's substring "
        "arithmetic must preserve.",
    tags=("io", "scan", "serialization"),
)
def fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.io.readers import read_fixed_width
    from hops_spark.session import scratch_dir
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 17 == 0)
              .select(F.concat(
                  F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
                  F.col("o_orderstatus"),
                  F.lpad(F.round(F.col("o_totalprice") * 100, 0)
                          .cast("long").cast("string"), 12, "0"))
                  .alias("value"))
              .repartition(4))
    path = os.path.join(scratch_dir("fw_rt", sf_dir), "orders")
    orders.write.mode("overwrite").text(path)
    back = read_fixed_width(spark, path, [12, 1, 12],
                            ["key", "status", "cents"])
    return (back.groupBy(F.col("status").alias("o_orderstatus"))
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.col("cents").cast("long")).alias("total_cents"),
                     F.min(F.col("key").cast("long")).alias("min_key"),
                     F.max(F.col("key").cast("long")).alias("max_key"))
                .orderBy("o_orderstatus"))


@register(
    "scan_xml_stream",
    sql="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
    doc="StreamXmlRecordReader roundtrip (hadoop-streaming "
        "StreamXmlRecordReader.java): the nation table is written as "
        "XML part files whose <rec> records deliberately SPAN LINES "
        "(fields separated by newlines — the property the reader's "
        "(?s) regex exists for), re-read via io/readers."
        "read_xml_chunks (wholetext + regexp chunk extraction), and "
        "every field parsed back out; the full 25-row roundtrip must "
        "hash-match the source parquet. Upgrades the XML reader from "
        "pytest-only to oracle-proven. Scale: record-per-chunk XML "
        "part files read file-parallel; a single multi-GB XML doc "
        "would need a custom datasource (documented in the reader).",
    tags=("io", "scan"),
)
def scan_xml_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hops_spark.io.readers import read_xml_chunks
    from hops_spark.session import scratch_dir

    nation = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name", "n_regionkey")
    xml = nation.select(F.format_string(
        "<rec>\n  <k>%s</k>\n  <n>%s</n>\n  <r>%s</r>\n</rec>",
        F.col("n_nationkey").cast("string"), F.col("n_name"),
        F.col("n_regionkey").cast("string")).alias("value"))
    path = os.path.join(scratch_dir("xml_rt", sf_dir), "nation")
    xml.repartition(4).write.text(path)
    recs = read_xml_chunks(spark, path + "/*.txt", "<rec>", "</rec>")
    return (recs.select(
        F.regexp_extract("record", r"<k>(\d+)</k>", 1).cast("long")
         .alias("n_nationkey"),
        F.regexp_extract("record", r"<n>([^<]*)</n>", 1).alias("n_name"),
        F.regexp_extract("record", r"<r>(\d+)</r>", 1).cast("long")
         .alias("n_regionkey"))
        .orderBy("n_nationkey"))
