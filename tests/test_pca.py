"""PCA preprocessing (ops/pca.py): the fixed-point covariance feeds a
BLAS eigendecomposition + whitening GEMM (pytest-only by the note-37
rule). The whitening CONTRACT is testable without trusting BLAS
details: whitened data must have ~identity covariance."""

import math

import numpy as np
from pyspark.sql import functions as F

from hops_spark.ops.pca import (PCA_MICRO, covariance_pairs, micro_means,
                                whiten_embeddings)

D = 16


def _hashnoise(i, j, seed):
    # full-rank deterministic pseudo-noise (the shader-hash trick) —
    # sin(a + b*i + c*j) alone is rank-2 by angle addition, useless
    # for a whitening test
    return (math.sin(seed + i * 12.9898 + j * 78.233)
            * 43758.5453) % 1.0 - 0.5


def _vecs(spark, n=300, seed=3):
    # anisotropic data: a few dominant directions + full-rank noise,
    # so whitening has real work to do on every component
    rows = []
    for i in range(n):
        base = [math.sin(seed + i * 0.37 + k) for k in range(3)]
        v = [3.0 * base[0] * math.cos(0.2 * j)
             + 1.5 * base[1] * math.sin(0.4 * j + 1)
             + 0.6 * _hashnoise(i, j, seed)
             for j in range(D)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_covariance_matches_numpy(spark):
    """The fixed-point covariance must track the float covariance to
    within the micro-grid quantization (1e-6 per entry + floor)."""
    d = _vecs(spark, n=200)
    got = {(r["i"], r["j"]): r["cov_micro"]
           for r in covariance_pairs(d, D).collect()}
    X = np.asarray([list(r["embedding"]) for r in
                    d.orderBy("vec_id").collect()], dtype=np.float64)
    Xm = np.floor(X * PCA_MICRO)
    mu = np.floor(Xm.sum(axis=0) / len(X))
    C = (Xm - mu).T @ (Xm - mu) / (len(X) * float(PCA_MICRO))
    assert len(got) == D * (D + 1) // 2
    for (i, j), v in got.items():
        assert v == math.floor(C[i, j]), (i, j)


def test_whitened_covariance_is_identity(spark):
    d = _vecs(spark, n=300)
    w = whiten_embeddings(d, D, eps=1e-9)
    Y = np.asarray([list(r["white"]) for r in
                    w.orderBy("vec_id").collect()], dtype=np.float64)
    C = np.cov(Y, rowvar=False, bias=True)
    # dominant directions flattened to ~unit variance
    assert np.allclose(np.diag(C), 1.0, atol=0.05)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 0.05


def test_whitening_deterministic_and_means_exact(spark):
    d = _vecs(spark, n=100)
    a = sorted(map(tuple, whiten_embeddings(d, D).collect()))
    b = sorted(map(tuple, whiten_embeddings(d, D).collect()))
    assert [r[0] for r in a] == [r[0] for r in b]
    assert all(list(x[1]) == list(y[1]) for x, y in zip(a, b))

    mu = micro_means(d, D)
    X = np.floor(np.asarray([list(r["embedding"]) for r in
                             d.orderBy("vec_id").collect()],
                            dtype=np.float64) * PCA_MICRO)
    want = np.floor(X.sum(axis=0) / len(X)).astype(int)
    assert mu == list(want)


def test_streaming_covariance_equals_batch(spark, tmp_path):
    """Draining the vector stream through covariance_stream (frozen
    means, running integer sums) and projecting the state reproduces
    the batch covariance_pairs against the same frozen means — the
    shared-derivation batch==stream law."""
    from hops_spark.streaming import (covariance_from_state,
                                      covariance_stream,
                                      run_to_completion)

    d = _vecs(spark, n=200)
    mu = micro_means(d, D)
    src = str(tmp_path / "vecs")
    d.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    state = run_to_completion(covariance_stream(stream, mu, D),
                              "cov_state")
    got = {(r["i"], r["j"]): r["cov_micro"]
           for r in covariance_from_state(state).collect()}
    want = {(r["i"], r["j"]): r["cov_micro"]
            for r in covariance_pairs(d, D, mu=mu).collect()}
    assert got == want and len(want) == D * (D + 1) // 2
