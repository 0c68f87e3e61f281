"""Round-13 optimization invariants.

The r13 norm-hoisting sweep (ops/similarity.cosine_pre) moves each
side's norm fold below the join so it runs once per row instead of
once per joined pair. That is only legal because the hoisted value is
BIT-IDENTICAL to the inline evaluation — same fold expression, same
operand order — and because the plan-time centroid norms
(_py_fold_norm) reproduce the Column fold exactly in IEEE doubles.
These tests pin both claims; any divergence would silently shift
cos_sim values across the whole similarity family.
"""

import math
import random
import struct

from pyspark.sql import functions as F

from hops_spark.ops.similarity import (_py_fold_norm, cosine, cosine_pre,
                                       dot, dot_fixed, norm)


def _bits(x):
    return struct.pack(">d", float(x))


def _vecs(n, dim, seed):
    rnd = random.Random(seed)
    return [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def test_py_fold_norm_bit_exact_vs_column_fold(spark):
    """Driver-side norm of a literal vector == the Column fold on the
    same values, bit for bit (includes denormal-ish and mixed-magnitude
    components where fold order matters)."""
    vecs = _vecs(40, 64, seed=13) + [
        [1e-154, 1e154, -1e-154],          # magnitude spread
        [0.1, 0.2, 0.3] * 21 + [0.4],      # repeating decimals, dim 64
        [0.0] * 8,                          # zero vector
    ]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<double>")
    got = [r[0] for r in df.select(norm(F.col("v")).alias("n")).collect()]
    want = [_py_fold_norm(v) for v in vecs]
    assert [_bits(g) for g in got] == [_bits(w) for w in want]


def test_cosine_pre_bit_identical_to_cosine(spark):
    """cosine_pre with hoisted norm columns == inline cosine, bit for
    bit, on random pairs — the invariant the whole r13 hoisting sweep
    rests on."""
    pairs = list(zip(_vecs(40, 64, seed=17), _vecs(40, 64, seed=19)))
    df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
    inline = [r[0] for r in
              df.select(cosine(F.col("a"), F.col("b")).alias("c"))
                .collect()]
    hoisted = [r[0] for r in
               (df.withColumn("_na", norm(F.col("a")))
                  .withColumn("_nb", norm(F.col("b")))
                  .select(cosine_pre(F.col("a"), F.col("b"),
                                     F.col("_na"), F.col("_nb")).alias("c"))
                  .collect())]
    assert [_bits(x) for x in inline] == [_bits(x) for x in hoisted]


def test_dot_fixed_bit_identical_to_hof_dot(spark):
    """The plan-time unrolled dot (pair-stage codegen path) == the
    aggregate/zip_with fold, bit for bit — including the 0.0 seed
    (a -0.0 first product must fold to +0.0 in both forms), float
    inputs (both cast per element to double), and mixed magnitudes
    where the left-to-right order matters."""
    pairs = list(zip(_vecs(30, 64, seed=23), _vecs(30, 64, seed=29)))
    pairs.append(([1e-154] * 32 + [1e154] * 32,
                  [1e-154] * 32 + [1e-154] * 32))
    pairs.append(([-0.0] * 64, [0.0] * 64))       # seed-add edge
    df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
    hof = [r[0] for r in
           df.select(dot(F.col("a"), F.col("b")).alias("d")).collect()]
    unrolled = [r[0] for r in
                df.select(dot_fixed(F.col("a"), F.col("b"), 64).alias("d"))
                  .collect()]
    assert [_bits(x) for x in hof] == [_bits(x) for x in unrolled]
    # float inputs (the embeddings table is array<float>): both paths
    # cast per element before multiplying
    df32 = spark.createDataFrame(pairs[:8], "a array<float>, b array<float>")
    hof32 = [r[0] for r in
             df32.select(dot(F.col("a"), F.col("b")).alias("d")).collect()]
    un32 = [r[0] for r in
            df32.select(dot_fixed(F.col("a"), F.col("b"), 64).alias("d"))
                .collect()]
    assert [_bits(x) for x in hof32] == [_bits(x) for x in un32]


def test_py_fold_norm_matches_naive_math():
    """Sanity: the fold is the plain sum-of-squares sqrt (not fsum/
    Kahan — the Column fold is a plain left fold and the twin must
    drift WITH it, not be more accurate)."""
    v = [0.1, 0.2, 0.3]
    acc = 0.0
    for x in v:
        acc += x * x
    assert _bits(_py_fold_norm(v)) == _bits(math.sqrt(acc))
