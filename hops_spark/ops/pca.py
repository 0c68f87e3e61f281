"""Embedding covariance + PCA whitening — the preprocessing step the
embedding-curation literature puts in front of clustering/dedup
(SemDeDup and friends cluster in a normalized/whitened space; public:
Jolliffe, "Principal Component Analysis"; Abdi & Williams 2010).

Split by engine-portability, the house rule:

- ``covariance_pairs`` is FIXED-POINT and oracle-exact: vectors snap
  to integer micros, the mean is an integer floor, and each (i, j)
  covariance cell is floor(sum(c_i*c_j) / (n*1e6)) — per-element
  integer products (<= 1.6e13 each, BIGINT sums safe past 10^5
  vectors per the int64 budget), one keyed (i, j) aggregate bounded
  by d(d+1)/2 cells. The d x d matrix is driver metadata.
- The eigendecomposition + projection ride numpy/BLAS and are
  therefore PYTEST-ONLY (the note-37 rule: BLAS last-ulp differences
  ban them from oracle rows): ``whiten_embeddings`` ships the d x d
  whitening matrix as DATA into one Arrow-batched mapInPandas GEMM —
  map-only, no shuffle, the same data path as assign_cells_gemm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_MICRO = 1_000_000


def micro_vectors(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, xm): vectors floor-snapped to integer micros. Map-only."""
    xm = F.transform(F.col(vec_col),
                     lambda v: F.floor(v.cast("double") * PCA_MICRO)
                                .cast("long"))
    return df.select(F.col(id_col), xm.alias("xm"))


def micro_means(df: DataFrame, d: int, id_col: str = "vec_id",
                vec_col: str = "embedding") -> list[int]:
    """Per-dimension integer mean floor(sum(x_micro)/n): one (pos)
    aggregate, d driver-side values."""
    rows = (micro_vectors(df, id_col, vec_col)
            .select(F.posexplode("xm").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.floor(F.sum("x") / F.count("*")).cast("long").alias("mu"))
            .collect())
    mu = {int(r["pos"]): int(r["mu"]) for r in rows}
    assert len(mu) == d
    return [mu[i] for i in range(d)]


def _centered_pair_rows(df: DataFrame, mu: list[int], d: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(i, j, p) rows: per input row, the d(d+1)/2 upper-triangle
    products of the mean-centered micro vector — the SHARED derivation
    both the batch covariance and its streaming twin reduce (one
    expression source, the batch==stream discipline)."""
    mu_arr = F.lit(mu).cast("array<long>")
    mv = micro_vectors(df, id_col, vec_col)
    cx = F.zip_with(F.col("xm"), mu_arr, lambda x, m: x - m)
    idx = F.sequence(F.lit(0), F.lit(d - 1))
    pairs = F.flatten(F.transform(
        idx, lambda i: F.transform(
            F.sequence(i, F.lit(d - 1)),
            lambda j: F.struct(
                i.cast("int").alias("i"), j.cast("int").alias("j"),
                (F.element_at("_cx", (i + 1).cast("int"))
                 * F.element_at("_cx", (j + 1).cast("int"))).alias("p")))))
    return (mv.select(cx.alias("_cx"))
              .select(F.explode(pairs).alias("s"))
              .select(F.col("s.i").alias("i"), F.col("s.j").alias("j"),
                      F.col("s.p").alias("p")))


def covariance_pairs(df: DataFrame, d: int, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     mu: list[int] | None = None) -> DataFrame:
    """(i, j, cov_micro) for the upper triangle i <= j: the mean-
    centered covariance in micro-units, floor(sum(c_i*c_j)/(n*1e6)).
    Pass ``mu`` to center against FROZEN means (the streaming-twin
    contract); default computes them from ``df``.

    Plan: means collect (d values — driver metadata), then ONE map
    pass emits the d(d+1)/2 per-row products as an exploded struct
    array and ONE keyed aggregate reduces them — no join, no per-pair
    shuffle beyond the bounded (i, j) cells. At 100 TB the map-side
    partials mean each executor ships d(d+1)/2 partial sums, nothing
    row-proportional."""
    n = df.count()
    if mu is None:
        mu = micro_means(df, d, id_col, vec_col)
    denom = float(n) * PCA_MICRO
    return (_centered_pair_rows(df, mu, d, id_col, vec_col)
            .groupBy("i", "j")
            .agg(F.floor(F.sum("p") / F.lit(denom)).cast("long")
                  .alias("cov_micro")))


def whiten_embeddings(df: DataFrame, d: int, eps: float = 1e-6,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(id, white): PCA-whitened vectors — W = diag(1/sqrt(l+eps)) U^T
    from the eigendecomposition of the micro-unit covariance, applied
    as one Arrow-batched GEMM per partition (mapInPandas; the matrix
    ships as DATA, never as a Column literal — note-37 discipline).
    Whitened data has ~identity covariance, which removes dominant-
    direction bias before cosine clustering (the SemDeDup-style
    preprocessing). BLAS-backed => pytest-only, never an oracle row."""
    import numpy as np
    from pyspark.sql import types as T

    # means once: covariance_pairs would recompute the identical
    # micro_means pass internally — pass them in and reuse for the
    # centering vector below (one full data pass instead of two)
    mu_int = micro_means(df, d, id_col, vec_col)
    cov_rows = covariance_pairs(df, d, id_col, vec_col, mu=mu_int).collect()
    C = np.zeros((d, d), dtype=np.float64)
    for r in cov_rows:
        # cov_micro = floor(sum(c_i*c_j) / (n*1e6)) with c in micro
        # units: micro^2/1e6 = micro-scaled covariance, so one more
        # /1e6 reaches real units (resolution 1e-6 per entry)
        v = float(r["cov_micro"]) / PCA_MICRO
        C[r["i"], r["j"]] = v
        C[r["j"], r["i"]] = v
    mu = np.asarray(mu_int, dtype=np.float64) / PCA_MICRO
    lam, U = np.linalg.eigh(C)
    W = (U / np.sqrt(np.maximum(lam, 0.0) + eps)).T   # d x d

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("white", T.ArrayType(T.DoubleType()))])

    def project(batches):
        import pandas as pd
        for pdf in batches:
            X = np.asarray([list(v) for v in pdf[vec_col]],
                           dtype=np.float64)
            Y = (X - mu) @ W.T
            yield pd.DataFrame({id_col: pdf[id_col],
                                "white": list(map(list, Y))})

    return (df.select(id_col, vec_col)
              .mapInPandas(project, schema=out_schema))
