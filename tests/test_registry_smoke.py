"""Smoke: every registered inventory query runs at sf0.001 and returns a
stable schema; entry() works."""

from __future__ import annotations

import pytest

from hops_spark.registry import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None
    # Driver-canonicalizer contract: registered outputs must be scalar
    # columns (array/map/struct cells are unhashable in the driver's
    # pandas canonicalization — r1's uniq_value_count crash).
    # DecimalType joins the ban (r7's only red row): the driver's pandas
    # canonicalizer coerces DuckDB DECIMAL to float64 ('172030226.4')
    # while Spark keeps decimal.Decimal('172030226.40') — the string
    # hash splits on every scale-trailing-zero value even though rows,
    # schema and values match. Outputs must be BIGINT cents/ppm or
    # round(x, 2) doubles; decimals may appear only as internal
    # accumulators.
    from pyspark.sql import types as T
    complex_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType,
                                  (T.ArrayType, T.MapType, T.StructType,
                                   T.DecimalType))]
    assert not complex_cols, f"{name}: banned output type {complex_cols}"


def test_entry(spark):
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_pandas_udaf_descriptor(spark):
    """UserDefinedValueAggregatorDescriptor via Arrow GROUPED_AGG: a
    geometric mean no built-in expresses, registered and run through the
    same spec-driven aggregate_job as the built-in descriptors."""
    import numpy as np

    from hops_spark.ops.agg import aggregate_job, pandas_udaf, register_aggregator

    register_aggregator(
        "GeoMean", pandas_udaf(lambda s: float(np.exp(np.log(s).mean())), "double"))
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0)], "k string, v double")
    out = aggregate_job(df, ["k"], [("GeoMean", "v", "geo"),
                                    ("DoubleValueSum", "v", "total")])
    got = {r.k: (round(r.geo, 6), r.total) for r in out.collect()}
    assert got == {"a": (4.0, 10.0), "b": (9.0, 30.0)}


def test_observe_counters_parity(spark, sf_dir):
    """MR Counters (counters/AbstractCounters.java:58) → df.observe:
    side-channel metrics collected during a single pass, without a
    second job or a collect of the data itself."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table

    obs = Observation("job_counters")
    li = load_table(spark, sf_dir, "lineitem")
    counted = li.observe(
        obs,
        F.count(F.lit(1)).alias("records_read"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned"),
    )
    # the "job": an unrelated aggregation; counters ride along
    counted.groupBy("l_linestatus").count().write.format("noop").mode("overwrite").save()
    got = obs.get
    want = li.count()
    assert got["records_read"] == want
    assert 0 < got["returned"] < want
