"""Multi-probe SRP-LSH properties (ops/similarity.knn_multiprobe).

The oracle query certifies hash-exactness of the whole pipeline; these
pin the claims the relational replay can't express:

- probe keys are distinct and Hamming-1 from the home bucket (so no
  candidate dedup is ever needed — each corpus vector lives in one
  bucket);
- multi-probe recall vs exact top-k dominates single-probe recall on
  the same bucket width (the reason the operator exists);
- the candidate count actually stays a small fraction of the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import hops_spark.ops.similarity as SIM
from hops_spark.io.readers import load_table

DIM, K, BITS, NPROBE = 64, 10, 8, 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _queries(emb, n=20):
    return (emb.filter(F.col("vec_id") < n)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))


def test_probe_keys_distinct_and_hamming1(spark, emb):
    rows = (SIM.jl_project(_queries(emb), "q_vec", DIM, BITS)
            .withColumn("keys", SIM.multiprobe_keys(BITS, NPROBE))
            .select("q_id", "keys").collect())
    for r in rows:
        keys = r["keys"]
        assert len(keys) == NPROBE
        assert len(set(keys)) == NPROBE
        home = keys[0]
        assert 0 <= home < (1 << BITS)
        for alt in keys[1:]:
            assert bin(home ^ alt).count("1") == 1


def _recall_vs_exact(emb, approx_df, n_queries):
    exact = SIM.knn_bruteforce(emb, _queries(emb, n_queries), K)
    want = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["neighbor_id"]) for r in approx_df.collect()}
    return len(want & got) / len(want)


def test_multiprobe_recall_dominates_single_probe(spark, emb):
    n_q = 20
    multi = SIM.knn_multiprobe(emb, _queries(emb, n_q), DIM, K, BITS, NPROBE)
    single = SIM.knn_multiprobe(emb, _queries(emb, n_q), DIM, K, BITS, 1)
    r_multi = _recall_vs_exact(emb, multi, n_q)
    r_single = _recall_vs_exact(emb, single, n_q)
    # nprobe=5 scans 5x the buckets; recall must not regress and must
    # show a real lift on the fixture (observed: large gap at 256
    # buckets over 500 vectors)
    assert r_multi >= r_single
    assert r_multi > 0


def test_candidates_bounded(spark, emb):
    n_total = emb.count()
    out = SIM.knn_multiprobe(emb, _queries(emb, 20), DIM, K, BITS, NPROBE)
    max_cand = out.agg(F.max("n_cand")).collect()[0][0]
    # expected nprobe * N / 2^bits per query; allow generous skew slack
    assert max_cand < n_total * NPROBE * 8 / (1 << BITS)


def test_nprobe_bounds_rejected(spark, emb):
    for bad in (0, BITS + 2):
        with pytest.raises(ValueError, match="nprobe"):
            SIM.knn_multiprobe(emb, _queries(emb, 2), DIM, K, BITS, bad)
