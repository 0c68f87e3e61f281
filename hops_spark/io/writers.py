"""Sinks (SURVEY.md §2.1).

Spark's file sinks + committers already give the reference's output
semantics (FileOutputCommitter atomic rename — Spark uses the same
committer family). These helpers cover the reference sinks that need a
mapping decision:

- MultipleOutputs / MultipleTextOutputFormat → ``write_partitioned``
  (route rows to per-key directories via partitionBy; reference
  mapreduce/lib/output/MultipleOutputs.java:179).
- MapFileOutputFormat (sorted + indexed sink) → ``write_sorted_bucketed``
  (bucketed, sorted-within-bucket parquet: the scalable point-lookup
  layout; reference mapreduce/lib/output/MapFileOutputFormat.java).
- TextOutputFormat (key<TAB>value lines) → ``write_kv_text``.
- NullOutputFormat → ``write_noop`` (format("noop"): full execution, no
  output — also the bench harness's action).
- HadoopArchives (HAR small-file packing) → ``compact`` (coalesced
  rewrite + manifest; reference hadoop-tools/hadoop-archives/.../HadoopArchives.java:83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, *route_cols: str, fmt: str = "parquet",
                      mode: str = "overwrite") -> None:
    """MultipleOutputs parity: one directory per distinct routing key.
    At 100 TB: keep routing-key cardinality bounded (directories = files
    × partitions); repartition by the route column first so each output
    directory is written by few tasks, not all of them."""
    (df.repartition(*[F.col(c) for c in route_cols])
       .write.partitionBy(*route_cols).format(fmt).mode(mode).save(path))


def write_sorted_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                          mode: str = "overwrite") -> None:
    """MapFileOutputFormat parity: bucketed + sorted layout for point
    lookups and shuffle-free joins on `key` (requires saveAsTable)."""
    (df.write.bucketBy(buckets, key).sortBy(key)
       .format("parquet").mode(mode).saveAsTable(table))


def write_kv_text(df: DataFrame, path: str, key: str, value: str, sep: str = "\t",
                  mode: str = "overwrite") -> None:
    """TextOutputFormat parity: key<sep>value lines."""
    (df.select(F.concat_ws(sep, F.col(key).cast("string"), F.col(value).cast("string"))
               .alias("value"))
       .write.mode(mode).text(path))


def write_noop(df: DataFrame) -> None:
    """NullOutputFormat parity: execute the full plan, discard the rows."""
    df.write.format("noop").mode("overwrite").save()


def compact(df: DataFrame, path: str, target_files: int = 1, mode: str = "overwrite") -> None:
    """HAR-style small-file compaction: coalesce to few large files.
    coalesce (not repartition) avoids a shuffle — tasks just claim more
    input splits."""
    df.coalesce(target_files).write.mode(mode).parquet(path)


def har_create(df: DataFrame, path: str, path_col: str = "path",
               target_files: int = 1, mode: str = "overwrite") -> None:
    """Hadoop Archive parity with a point-read index (reference
    hadoop-tools/hadoop-archives/.../HadoopArchives.java:83 writes
    ``_index`` per-file entries + ``_masterindex`` range blocks).

    Layout: rows (one per archived file) are range-partitioned and
    sorted by ``path_col`` into ``<path>/store`` parquet parts — so each
    part holds one contiguous path range and parquet row-group min/max
    stats make a per-path point read prune to a single row group. The
    manifest ``<path>/_index`` records one row per physical part:
    (part_file, lo_path, hi_path, n_files) — exactly the masterindex
    contract: small (one row per part file, not per archived file),
    driver-loadable, maps a path to the one part that can hold it."""
    (df.repartitionByRange(target_files, F.col(path_col))
       .sortWithinPartitions(path_col)
       .write.mode(mode).parquet(f"{path}/store"))
    spark = df.sparkSession
    store = spark.read.parquet(f"{path}/store")
    idx = (store.groupBy(F.input_file_name().alias("part_file"))
                .agg(F.min(path_col).alias("lo_path"),
                     F.max(path_col).alias("hi_path"),
                     F.count("*").alias("n_files")))
    idx.coalesce(1).write.mode(mode).parquet(f"{path}/_index")


def har_lookup(spark, path: str, file_path: str, path_col: str = "path") -> DataFrame:
    """Point read from a ``har_create`` archive: consult the manifest
    for the one part whose [lo, hi] range covers the path (driver-side —
    the masterindex is contractually tiny, one row per part file), then
    scan only that part with a pushed-down equality filter (sorted
    layout → row-group stats prune to one group)."""
    parts = (spark.read.parquet(f"{path}/_index")
                  .filter((F.col("lo_path") <= file_path)
                          & (F.col("hi_path") >= file_path))
                  .select("part_file").collect())
    if not parts:
        return spark.read.parquet(f"{path}/store").limit(0)
    return (spark.read.parquet(*[r[0] for r in parts])
                 .filter(F.col(path_col) == file_path))


_SEQ_CODECS = {
    "gzip": "org.apache.hadoop.io.compress.GzipCodec",
    "bzip2": "org.apache.hadoop.io.compress.BZip2Codec",
    "snappy": "org.apache.hadoop.io.compress.SnappyCodec",
    "deflate": "org.apache.hadoop.io.compress.DefaultCodec",
}


def write_sequence_file(df: DataFrame, path: str, key: str = "key",
                        value: str = "value", compression: str | None = None) -> None:
    """SequenceFileOutputFormat parity (io/SequenceFile.java:837 Writer;
    mapreduce/lib/output/SequenceFileOutputFormat.java): write (key,
    value) columns as a Hadoop SequenceFile. Writable types are inferred
    from the column types (int/long/float/double/str/bytes). RDD-based
    by necessity — kept for interchange with reference clusters; Parquet
    is this engine's native format (row groups + stats replace sync
    markers + block compression)."""
    rdd = df.select(key, value).rdd.map(lambda r: (r[0], r[1]))
    rdd.saveAsSequenceFile(path, _SEQ_CODECS.get(compression))


def write_bloom_parquet(df: DataFrame, path: str, bloom_cols: list[str],
                        expected_ndv: int = 100_000, mode: str = "overwrite") -> None:
    """BloomMapFile parity (io/BloomMapFile.java + util/bloom/BloomFilter.java):
    parquet with per-column bloom filters. Point lookups on a bloom
    column skip whole row groups on definite-miss — the same
    fast-negative contract as BloomMapFile.get(); at 100 TB this is the
    difference between touching every file and touching one."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = (w.option(f"parquet.bloom.filter.enabled#{c}", "true")
              .option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)))
    w.parquet(path)
