"""Aggregation library (SURVEY.md §2.4) — the ValueAggregator framework
re-expressed declaratively.

The reference's aggregate package (mapreduce/lib/aggregate/) is a
spec-driven job: each input row yields ``(aggType:id, value)`` records
and the framework wires partial (combiner) + final aggregation per
``aggType``. In Spark the partial/final split is automatic
(HashAggregate partial → final), so the whole framework collapses to a
registry of named Column expressions applied in one ``groupBy().agg()``.

Aggregator parity map (reference file → expression):
- LongValueSum.java:33 / DoubleValueSum.java:34 / IntSumReducer /
  LongSumReducer            → ``sum``
- LongValueMax/Min.java:33  → ``max`` / ``min``
- StringValueMax/Min.java:33→ ``max`` / ``min`` on string
- UniqValueCount.java:35    → ``uniq_value_count`` (distinct with cap;
  the reference truncates arbitrarily — we sort before slicing so the
  result is deterministic, SURVEY §7.4.5)
- ValueHistogram.java:38    → ``value_histogram`` (count/min/median/
  max/avg/stddev over per-item counts)
- UserDefinedValueAggregatorDescriptor → ``register_aggregator``

Scale note: every expression here is a JVM-side declarative aggregate →
map-side partial combine, no Python in the hot path. ``collect_set``
with a cap is the one memory-risky op; ``uniq_value_count`` therefore
caps per-group set size *before* the slice when ``max_unique`` is set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniq_count(value: Column | str, max_unique: int | None = None) -> Column:
    """UniqValueCount: number of distinct values, optionally capped
    (mapreduce.aggregate.max.num.unique.values)."""
    c = F.countDistinct(value)
    if max_unique is not None:
        c = F.least(c, F.lit(max_unique))
    return c


def uniq_values(value: Column | str, max_unique: int | None = None) -> Column:
    """UniqValueCount's retained value list — deterministic: sorted, then
    capped (the reference truncates in arrival order; we pin sort-then-
    slice semantics so oracles can match, SURVEY §7.4.5)."""
    arr = F.sort_array(F.collect_set(value))
    if max_unique is not None:
        arr = F.slice(arr, 1, max_unique)
    return arr


# Named aggregator registry (UserDefinedValueAggregatorDescriptor parity).
AGGREGATORS: dict[str, Callable[[Column | str], Column]] = {
    "LongValueSum": lambda c: F.sum(F.col(c).cast("long") if isinstance(c, str) else c.cast("long")),
    "DoubleValueSum": lambda c: F.sum(F.col(c).cast("double") if isinstance(c, str) else c.cast("double")),
    "LongValueMax": lambda c: F.max(F.col(c).cast("long") if isinstance(c, str) else c.cast("long")),
    "LongValueMin": lambda c: F.min(F.col(c).cast("long") if isinstance(c, str) else c.cast("long")),
    "StringValueMax": lambda c: F.max(c),
    "StringValueMin": lambda c: F.min(c),
    "ValueCount": lambda c: F.count(c),
    "UniqValueCount": uniq_count,
}


def register_aggregator(name: str, fn: Callable[[Column | str], Column]) -> None:
    """Plug in a user aggregator (classname-spec parity)."""
    AGGREGATORS[name] = fn


def aggregate_job(df: DataFrame, key_cols: list[str],
                  spec: list[tuple[str, str, str]]) -> DataFrame:
    """ValueAggregatorJob parity: run a list of (aggType, value_col, alias)
    descriptors as ONE groupBy — a single shuffle regardless of how many
    aggregators the spec lists (the reference ran them all in one MR job
    too; mapreduce/lib/aggregate/ValueAggregatorJob.java).

    Pandas (GROUPED_AGG) descriptors can't share an agg() with JVM
    aggregates (Spark limitation), so a mixed spec runs as two
    aggregations over the same shuffle key, joined on the keys — both
    sides partition identically, so the join itself is co-located."""
    jvm = [(t, c, a) for t, c, a in spec
           if not getattr(AGGREGATORS[t], "_is_pandas", False)]
    pnd = [(t, c, a) for t, c, a in spec
           if getattr(AGGREGATORS[t], "_is_pandas", False)]
    parts = []
    for group in (jvm, pnd):
        if group:
            exprs = [AGGREGATORS[t](c).alias(a) for t, c, a in group]
            parts.append(df.groupBy(*key_cols).agg(*exprs))
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, key_cols)
    # restore the spec's column order
    return out.select(*key_cols, *[a for _, _, a in spec])


def value_histogram(df: DataFrame, key_cols: list[str], item_col: str,
                    max_items: int = 10) -> DataFrame:
    """ValueHistogram parity (mapreduce/lib/aggregate/ValueHistogram.java:38).

    Per key: number of distinct items, min/median/max/avg/stddev of the
    per-item occurrence counts, plus the retained item list itself
    (ValueHistogram's getReportDetails) — deterministic: items sorted
    ascending, capped at ``max_items``, rendered "item:count|…" (scalar
    string so the driver canonicalizer can hash it). Two-level
    aggregation — both levels are shuffle-partial-combined; level 2
    groups on a prefix of level 1's keys so AQE can often reuse the
    exchange. The item list collects only the *capped* per-key slice via
    sort+slice on the grouped structs, so driver memory per key is
    bounded by the distinct-item count post-aggregation (one struct per
    distinct item, not per row)."""
    per_item = df.groupBy(*key_cols, item_col).agg(F.count("*").alias("_n"))
    items = F.slice(F.sort_array(F.collect_list(F.struct(item_col, "_n"))),
                    1, max_items)
    return per_item.groupBy(*key_cols).agg(
        F.count("*").alias("n_distinct_items"),
        F.min("_n").alias("min_count"),
        F.expr("median(_n)").alias("median_count"),
        F.max("_n").alias("max_count"),
        F.avg("_n").alias("avg_count"),
        F.stddev_pop("_n").alias("stddev_count"),
        F.array_join(
            F.transform(items, lambda s: F.concat_ws(
                ":", s[item_col].cast("string"), s["_n"].cast("string"))),
            "|").alias("items_capped"),
    )


def salted_agg(df: DataFrame, key_cols: list[str], aggs: list[Column],
               salt_buckets: int = 32) -> DataFrame:
    """Skew-mitigated aggregation (RehashPartitioner parity beyond AQE,
    SURVEY §4 item 5): two-phase — partial agg on (key, salt), final agg
    on key. Only valid for decomposable aggregates (sum/count/min/max);
    callers pass the PARTIAL exprs and this re-aggregates with the same
    function by alias convention: partial alias X is re-aggregated as
    sum(X) unless alias starts with min_/max_."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(*aggs)
    finals = []
    for c in partial.columns:
        if c in key_cols or c == "_salt":
            continue
        if c.startswith("min_"):
            finals.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            finals.append(F.max(c).alias(c))
        else:
            finals.append(F.sum(c).alias(c))
    return partial.groupBy(*key_cols).agg(*finals)


def pandas_udaf(fn: Callable, return_type: str = "double") -> Callable[[Column | str], Column]:
    """Wrap a Python reduction (pandas Series -> scalar) as a registrable
    aggregator: the escape hatch for descriptors that aren't expressible
    as Column expressions (the full UserDefinedValueAggregatorDescriptor
    generality). Arrow-batched GROUPED_AGG pandas_udf — not row-at-a-time;
    still the slow path vs. the JVM-side expressions above, so reserve it
    for genuinely custom math."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    udaf = pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)

    def apply(c: Column | str) -> Column:
        return udaf(F.col(c) if isinstance(c, str) else c)

    apply._is_pandas = True  # aggregate_job splits mixed specs on this
    return apply
