"""lit_array must be VALUE-IDENTICAL to per-element F.lit — it exists
purely to skip py4j per-element literal conversion (optimization r12);
any divergence (a double off by one ulp, a type drift) would silently
shift every codebook-shaped query."""

import random
import struct

from pyspark.sql import functions as F

from hops_spark.ops.litfast import lit_array


def _bits(xs):
    return [struct.pack(">d", float(x)) for x in xs]


def test_doubles_bit_exact(spark):
    random.seed(7)
    vals = ([random.uniform(-1, 1) for _ in range(50)]
            + [1e-308, -1e-308, 1.5e300, -2.5e-10, 0.0, -0.0, 1.0,
               123456.789e-20, 0.1 + 0.2])
    df = spark.range(1)
    a = df.select(F.lit(vals).alias("v")).collect()[0][0]
    b = df.select(lit_array(vals, "double").alias("v")).collect()[0][0]
    assert _bits(a) == _bits(b)


def test_matrix_and_cube_shapes(spark):
    random.seed(11)
    mat = [[random.uniform(-5, 5) for _ in range(8)] for _ in range(4)]
    df = spark.range(1)
    a = df.select(F.lit(mat).alias("v")).collect()[0][0]
    b = df.select(lit_array(mat, "double").alias("v")).collect()[0][0]
    assert [_bits(r) for r in a] == [_bits(r) for r in b]
    cube = [[[1.5, 2.5], [3.5]], [], [[4.5]]]
    c = df.select(lit_array(cube, "double").alias("v")).collect()[0][0]
    assert c == [[[1.5, 2.5], [3.5]], [], [[4.5]]]
    t = df.select(lit_array(cube, "double").alias("v")).schema[0].dataType
    assert t.simpleString() == "array<array<array<double>>>"


def test_longs_exact_and_typed(spark):
    vals = [0, 1, -1, 2 ** 62, -(2 ** 62), 999999999999]
    df = spark.range(1)
    a = df.select(F.lit(vals).alias("v")).collect()[0][0]
    b = df.select(lit_array(vals, "long").alias("v")).collect()[0][0]
    assert a == b
    t = df.select(lit_array(vals, "long").alias("v")).schema[0].dataType
    assert t.simpleString() == "array<bigint>"
    jag = [[0, 3], [], [5]]
    j = df.select(lit_array(jag, "long").alias("v")).collect()[0][0]
    assert j == [[0, 3], [], [5]]


def test_rejects_non_finite():
    import pytest
    with pytest.raises(ValueError):
        lit_array([1.0, float("inf")], "double")
    with pytest.raises(ValueError):
        lit_array([float("nan")], "double")
