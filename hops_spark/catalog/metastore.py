"""HopsFS-style metadata catalog as DataFrames (SURVEY.md §1.4, §2.11).

The reference stores NameNode state as relational tables in RonDB —
inodes keyed by (name, parentId, partitionId) with partition-pruned
index scans (BaseINodeLock.java:69-118), plus blocks/replicas/leases
and a MetadataLogEntry CDC stream. Here the same model is a catalog of
DataFrames; the 100 TB layout rule is: partition `inodes` storage by a
hash of parent (the reference's partitionId is exactly that —
directory children co-located), so listings are partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INODE_SCHEMA = T.StructType([
    T.StructField("inode_id", T.LongType(), False),
    T.StructField("parent", T.StringType(), True),
    T.StructField("partition_id", T.IntegerType(), True),
    T.StructField("name", T.StringType(), False),
    T.StructField("is_dir", T.BooleanType(), False),
    T.StructField("size", T.LongType(), True),
    T.StructField("mtime", T.TimestampType(), True),
    T.StructField("owner", T.StringType(), True),
    # Inline small-file storage (reference INodeFile.storeFileDataInDB,
    # INodeFile.java:204, ≤64 KB in-DB) — the multimodal column pattern.
    T.StructField("small_file_data", T.BinaryType(), True),
])

METADATA_LOG_SCHEMA = T.StructType([
    T.StructField("tx_id", T.LongType(), False),
    T.StructField("inode_id", T.LongType(), False),
    T.StructField("parent", T.StringType(), True),
    T.StructField("op", T.StringType(), False),       # ADD | DELETE | UPDATE | RENAME
    T.StructField("size_delta", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

N_PARTITIONS = 64  # partitionId space; children of a dir share one partition


def with_partition_id(df: DataFrame, parent_col: str = "parent") -> DataFrame:
    """Assign the reference's partitionId: hash(parent) — co-locates a
    directory's children so listings prune to one partition."""
    return df.withColumn("partition_id",
                         F.pmod(F.abs(F.hash(F.col(parent_col))), F.lit(N_PARTITIONS))
                          .cast("int"))


def inodes_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic inode tree derived from the documents fixture:
    source → directory, document → file (name='doc_<id>', size=n_chars).
    Used by the oracle-gated §2.11 queries."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = d.select(F.col("doc_id").alias("inode_id"),
                     F.col("source").alias("parent"),
                     F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("name"),
                     F.col("n_chars").cast("long").alias("size"))
    return with_partition_id(files)


def listing(inodes: DataFrame, parent: str, batch: int = 1000) -> DataFrame:
    """getListing: partition-pruned children scan, name-ordered, batched
    (reference FSDirStatAndListingOp.getListing / PPIS)."""
    return (inodes.filter(F.col("parent") == parent)
                  .orderBy("name").limit(batch))


def file_info(inodes: DataFrame, parent: str, name: str) -> DataFrame:
    """getFileInfo: PK point lookup (name, parent[, partition])."""
    return inodes.filter((F.col("parent") == parent) & (F.col("name") == name))


def batched_lookup(inodes: DataFrame, keys: DataFrame) -> DataFrame:
    """Batched PK ops (BaseINodeLock.lockInodesUsingPkBatchTx): broadcast
    the key list, join — no shuffle of the big table."""
    return inodes.join(F.broadcast(keys), ["parent", "name"], "left_semi")


def glob_status(inodes: DataFrame, pattern: str) -> DataFrame:
    """globStatus: glob → anchored regex over names."""
    rx = "^" + pattern.replace(".", r"\.").replace("*", ".*").replace("?", ".") + "$"
    return inodes.filter(F.col("name").rlike(rx))


def content_summary(inodes: DataFrame) -> DataFrame:
    """du / getContentSummary per directory."""
    return (inodes.groupBy(F.col("parent").alias("dir"))
                  .agg(F.count("*").alias("n_files"),
                       F.sum("size").alias("total_bytes")))


BLOCK_SIZE = 16_384     # fixture-scale block size (reference: 64-128 MB)
N_DATANODES = 16
REPLICATION = 3


def blocks_from_inodes(inodes: DataFrame) -> DataFrame:
    """blocks table (reference BlockInfoContext / BlockInfoDALAdaptor):
    one row per block of each file — block_id, inode_id, block_index,
    num_bytes (last block partial). Derived deterministically so the
    DuckDB oracle rebuilds it bit-for-bit."""
    n_blocks = F.greatest(F.ceil(F.col("size") / BLOCK_SIZE), F.lit(1)).cast("int")
    ex = inodes.select(
        "inode_id", "size",
        F.explode(F.sequence(F.lit(0), n_blocks - 1)).alias("block_index"))
    return ex.select(
        (F.col("inode_id") * 1024 + F.col("block_index")).alias("block_id"),
        "inode_id", "block_index",
        F.least(F.lit(BLOCK_SIZE),
                F.col("size") - F.col("block_index") * BLOCK_SIZE)
         .cast("long").alias("num_bytes"))


def replicas_from_blocks(blocks: DataFrame) -> DataFrame:
    """replicas table (reference ReplicaContext): REPLICATION rows per
    block, datanode placement + ~2% deterministic loss (md5-derived) so
    under-replication analytics have subject matter."""
    ex = blocks.select(
        "block_id",
        F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("replica_idx"))
    mix = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.col("block_id").cast("string"),
        F.col("replica_idx").cast("string"))), 1, 7), 16, 10).cast("long")
    return (ex.withColumn("datanode_id",
                          F.pmod(mix, F.lit(N_DATANODES)).cast("int"))
              .withColumn("is_lost", F.pmod(mix, F.lit(50)) == 0)
              .filter(~F.col("is_lost"))
              .drop("is_lost"))
