"""Hashed linear probe (ops/classify.py): the trainer must actually
LEARN on separable data — the registered fixture queries only prove
deterministic portability (the synthetic corpus draws every lang/source
from one shared vocabulary, so majority-class accuracy there is a data
property, not a trainer property)."""

from pyspark.sql import functions as F

from hops_spark.ops.classify import (hashed_features, linear_probe_scores,
                                     train_linear_probe)


def _separable_corpus(spark, n=200):
    rows = []
    for i in range(n):
        y = i % 2
        vocab = (["alpha", "beta", "gamma", "delta"] if y
                 else ["omega", "psi", "chi", "phi"])
        shared = ["the", "of", "and"]
        ws = [vocab[(i * 7 + j) % 4] for j in range(10)] \
            + [shared[j % 3] for j in range(5)]
        rows.append((i, " ".join(ws), y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_probe_learns_separable(spark):
    d = _separable_corpus(spark)
    w = train_linear_probe(d, dim=64, iters=3)
    assert len(w) == 65 and any(wi != 0 for wi in w)
    scored = linear_probe_scores(d, w, dim=64)
    n_right = scored.filter(F.col("pred") == F.col("_y")).count()
    assert n_right == d.count()     # perfectly separable -> 100%


def test_probe_training_deterministic(spark):
    d = _separable_corpus(spark, n=60)
    assert train_linear_probe(d, dim=32, iters=2) == \
        train_linear_probe(d, dim=32, iters=2)


def test_features_length_invariant(spark):
    """floor((k*c)*1e6 / (k*t)) == floor(c*1e6/t): repeating a doc's
    text verbatim must not move its normalized feature vector."""
    d1 = spark.createDataFrame([(1, "a b c a", 0)],
                               "doc_id long, text string, y int")
    d3 = spark.createDataFrame([(1, "a b c a " * 3, 0)],
                               "doc_id long, text string, y int")
    f1 = {(r["feat"], r["x"]) for r in hashed_features(d1).collect()}
    f3 = {(r["feat"], r["x"]) for r in hashed_features(d3).collect()}
    assert f1 == f3
