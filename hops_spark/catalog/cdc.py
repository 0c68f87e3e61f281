"""CDC + incremental quota maintenance (SURVEY.md §1.4, §2.4 'Async
quota aggregation').

Reference semantics: every namespace mutation appends a MetadataLogEntry
row (MetadataLogContext.java:25,74; FSDirectory.logMetadataEvent), and
QuotaUpdateManager (QuotaUpdateManager.java:52,109,170) asynchronously
folds batched (namespace, diskspace) deltas up the directory tree so
`du` never rescans.

Spark realization: the metadata log is a Structured Streaming source;
quota state is maintained by a foreachBatch incremental upsert —
each micro-batch aggregates its deltas per directory and merges into
the state table. Correctness contract (tested): incremental state ≡
recompute-from-scratch over the full log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def quota_deltas(log: DataFrame) -> DataFrame:
    """Per-directory (namespace, diskspace) deltas from a metadata-log
    batch: ADD counts +1/size, DELETE −1/−size, UPDATE 0/size_delta."""
    ns = (F.when(F.col("op") == "ADD", 1)
           .when(F.col("op") == "DELETE", -1)
           .otherwise(0))
    ds = (F.when(F.col("op") == "ADD", F.col("size_delta"))
           .when(F.col("op") == "DELETE", -F.col("size_delta"))
           .when(F.col("op") == "UPDATE", F.col("size_delta"))
           .otherwise(F.lit(0)))
    return (log.groupBy("parent")
               .agg(F.sum(ns).alias("ns_delta"), F.sum(ds).alias("ds_delta")))


class QuotaState:
    """Driver-held incremental quota table (parent → namespace, diskspace).

    In production the state would live in a transactional sink (Delta
    MERGE / RDBMS upsert) written from foreachBatch; here it is a small
    DataFrame (#directories rows — metadata-scale, not data-scale) that
    we fold each micro-batch into. The fold is a full-outer merge — the
    same shape QuotaUpdateManager applies to its batched deltas."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.state: DataFrame | None = None

    def apply_batch(self, batch: DataFrame, _epoch: int | None = None) -> None:
        deltas = quota_deltas(batch)
        if self.state is None:
            self.state = deltas.select(
                "parent",
                F.col("ns_delta").alias("namespace"),
                F.col("ds_delta").alias("diskspace")).localCheckpoint()
            return
        merged = (self.state.join(deltas, "parent", "full")
                  .select("parent",
                          (F.coalesce(F.col("namespace"), F.lit(0))
                           + F.coalesce(F.col("ns_delta"), F.lit(0))).alias("namespace"),
                          (F.coalesce(F.col("diskspace"), F.lit(0))
                           + F.coalesce(F.col("ds_delta"), F.lit(0))).alias("diskspace")))
        # localCheckpoint truncates lineage so state doesn't grow a plan
        # per batch (the streaming-state analogue).
        self.state = merged.localCheckpoint()

    def snapshot(self) -> DataFrame:
        assert self.state is not None, "no batches applied"
        return self.state


def quota_from_scratch(log: DataFrame) -> DataFrame:
    """Oracle: recompute quota state from the entire log in one batch."""
    return (quota_deltas(log)
            .select("parent", F.col("ns_delta").alias("namespace"),
                    F.col("ds_delta").alias("diskspace")))


def tail_metadata_log(log_dir: str, spark: SparkSession, schema) -> DataFrame:
    """CDC tail: the metadata log as a file stream (consumers poll the
    reference's metadata_log table the same way)."""
    return spark.readStream.schema(schema).parquet(log_dir)
