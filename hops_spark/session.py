"""SparkSession factory with local-test and at-scale configuration profiles.

Design notes (100 TB target):
- AQE is always on: runtime partition coalescing, skew-join splitting and
  dynamic broadcast conversion replace the reference's hand-tuned
  partitioner zoo (RehashPartitioner, TotalOrderPartitioner sampling —
  see SURVEY.md §2.5/§4).
- ``spark.sql.shuffle.partitions`` defaults to ~cores locally; the
  ``scale`` profile leaves a high static value and lets AQE coalesce,
  which is the recommended setup for a 1000-executor cluster.
- Session timezone is pinned to UTC so results compare bit-for-bit with
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Profile → extra confs layered over the common base.
_PROFILES: dict[str, dict[str, str]] = {
    # Local iteration / CI: one JVM, threads = cores.
    "local": {
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "spark.ui.enabled": "false",
    },
    # Cluster preset: static high partition count, AQE coalesces down.
    # These are *declarative defaults* — a real deployment overrides
    # executor sizing via spark-submit.
    "scale": {
        "spark.sql.shuffle.partitions": "4096",
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        # Operator guardrails that tighten at cluster scale: the exact
        # n-gram Jaccard audit path drops shingles above this doc
        # frequency (pair surface is cap² per surviving shingle) —
        # ops/dedup.ngram_jaccard_pairs resolves its default from here.
        "spark.hops.dedup.maxShingleFreq": "1000",
    },
}

_BASE: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Deterministic float formatting for oracle comparison.
    "spark.sql.legacy.allowNegativeScaleOfDecimal": "false",
}


def get_spark(app: str = "hops_spark", profile: str = "local",
              master: str | None = None, **extra: str) -> SparkSession:
    """Build (or reuse) the SparkSession for the given profile."""
    b = SparkSession.builder.appName(app)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    b = b.master(master)
    conf = dict(_BASE)
    conf.update(_PROFILES.get(profile, {}))
    conf.update(extra)
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()


def scratch_dir(name: str, key: str = "") -> str:
    """Fixed per-(name, key) scratch directory under the system tempdir,
    WIPED and recreated on every call. Queries that materialize an
    on-disk artifact (avro containers, ANN index shards) write here so
    repeated bench/oracle/battery runs REUSE one path instead of
    leaking a fresh mkdtemp per invocation (round-5 ADVICE). The
    returned dir is empty and owned by the caller until its next call
    with the same (name, key)."""
    import hashlib
    import shutil
    import tempfile
    suffix = hashlib.md5(key.encode()).hexdigest()[:8] if key else "0"
    d = os.path.join(tempfile.gettempdir(), "hops_scratch",
                     f"{name}-{suffix}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
