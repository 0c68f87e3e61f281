"""Deterministic distributed data generators (SURVEY.md §2.10):
TeraGen / RandomWriter / RandomTextWriter parity.

The reference generates data in parallel map tasks from a seed +
row-index function (TeraGen.java:68 uses a skip-ahead random per row;
RandomTextWriter draws from a fixed word list). Spark-native: a
``spark.range(n)`` scan (splits across executors for free) + pure
Column expressions keyed on the row id — same output for any
parallelism, no RNG state to coordinate. md5-based mixing keeps every
value reproducible and engine-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 113 common words — stands in for RandomTextWriter's word table.
WORDS = ("the of and a to in is you that it he was for on are as with his they I "
         "at be this have from or one had by word but not what all were we when "
         "your can said there use an each which she do how their if will up other "
         "about out many then them these so some her would make like him into time "
         "has look two more write go see number no way could people my than first "
         "water been call who oil its now find long down day did get come made may "
         "part over new sound take only little work know place year live me back").split()


def _mix(seed: int, *cols) -> F.Column:
    """64-bit deterministic mix of (seed, cols) via md5 — stable across
    engines and partitionings."""
    parts = [F.lit(str(seed))] + [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
                                  for c in cols]
    return F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast("long")


def teragen(spark: SparkSession, n_rows: int, seed: int = 42,
            n_partitions: int | None = None) -> DataFrame:
    """TeraGen parity: rows of (key: 10-byte-ish sortable string,
    row_id, filler). Key derived deterministically from (seed, id)."""
    rng = spark.range(0, n_rows, numPartitions=n_partitions)
    key = F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id").cast("string"))), 1, 10)
    filler = F.rpad(F.upper(F.substring(F.md5(F.concat_ws("|", F.lit("f"),
                    F.col("id").cast("string"))), 1, 8)), 78, "X")
    return rng.select(key.alias("key"), F.col("id").alias("row_id"),
                      filler.alias("filler"))


def random_writer(spark: SparkSession, n_rows: int, seed: int = 42,
                  min_value_len: int = 10, max_value_len: int = 100,
                  n_partitions: int | None = None) -> DataFrame:
    """RandomWriter parity: (binary-ish key, variable-length value)."""
    rng = spark.range(0, n_rows, numPartitions=n_partitions)
    h = _mix(seed, "id")
    vlen = (F.pmod(h, F.lit(max_value_len - min_value_len + 1)) + min_value_len).cast("int")
    value_pool = F.repeat(F.md5(F.concat_ws("|", F.lit("v"), F.col("id").cast("string"))),
                          (max_value_len // 32) + 1)
    return rng.select(
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id").cast("string"))).alias("key"),
        F.substring(value_pool, F.lit(1), vlen).alias("value"))


def random_text_writer(spark: SparkSession, n_rows: int, words_per_row: int = 10,
                       seed: int = 42, n_partitions: int | None = None) -> DataFrame:
    """RandomTextWriter parity: rows of space-joined words drawn
    deterministically from the word table."""
    rng = spark.range(0, n_rows, numPartitions=n_partitions)
    word_arr = F.array(*[F.lit(w) for w in WORDS])
    idx = F.sequence(F.lit(0), F.lit(words_per_row - 1))
    text = F.concat_ws(" ", F.transform(
        idx, lambda i: F.element_at(
            word_arr,
            (F.pmod(_mix(seed, F.col("id"), i), F.lit(len(WORDS))) + 1).cast("int"))))
    return rng.select(F.col("id").alias("row_id"), text.alias("text"))


def teravalidate(df: DataFrame, key_col: str = "key",
                 n_partitions: int | None = None,
                 presort: bool = True) -> DataFrame:
    """TeraValidate parity (terasort/TeraValidate.java): validate global
    sort order the way the reference does — each task scans ITS
    partition for order violations (map-only; cross-batch state inside
    mapInPandas) and emits (min, max, count, checksum); cross-partition
    boundaries are then checked over the per-partition stats, which are
    contractually tiny (one row per partition), so the final window is
    fine on a single partition. Returns ONE row:
    (n_rows, n_misordered, first_key, last_key, checksum).

    ``presort=True`` composes terasort+validate (sort here, then prove
    it). ``presort=False`` validates the data AS LAID OUT — the true
    TeraValidate contract over a stored terasort output, where the
    partition order is the file order and misorder is detectable."""
    import pandas as pd

    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    if presort:
        df = (df.repartitionByRange(n_parts, F.col(key_col))
                .sortWithinPartitions(key_col))
    sorted_df = (df.select(F.col(key_col).alias("key"),
                           F.pmod(F.conv(F.substring(F.md5(key_col), 1, 15),
                                         16, 10).cast("long"),
                                  F.lit(1_000_000_000)).alias("_h"),
                           F.spark_partition_id().alias("_pid")))

    def check(batches):
        last = None
        pid, n, bad, lo, hi, ck = None, 0, 0, None, None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            keys = pdf["key"].tolist()
            for k in keys:
                if last is not None and k < last:
                    bad += 1
                last = k
            n += len(keys)
            lo = keys[0] if lo is None else lo
            hi = keys[-1]
            ck += int(pdf["_h"].sum())
        if pid is not None:
            yield pd.DataFrame({"pid": [pid], "n": [n], "bad": [bad],
                                "lo": [lo], "hi": [hi], "ck": [ck]})

    stats = sorted_df.mapInPandas(
        check, "pid int, n long, bad long, lo string, hi string, ck long")
    from pyspark.sql.window import Window
    w = Window.orderBy("pid")
    stats = stats.withColumn("_prev_hi", F.lag("hi").over(w))
    return (stats.agg(
        F.sum("n").alias("n_rows"),
        (F.sum("bad")
         + F.sum(F.when(F.col("_prev_hi") > F.col("lo"), 1).otherwise(0)))
        .alias("n_misordered"),
        F.min("lo").alias("first_key"),
        F.max("hi").alias("last_key"),
        F.sum("ck").alias("checksum")))
