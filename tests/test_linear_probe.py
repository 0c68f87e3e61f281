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


def test_probe_score_stream_equals_batch(spark, tmp_path):
    """Draining a multi-file doc stream through probe_score_stream
    (frozen weights) yields exactly the batch scores — the learned
    gate can sit on the ingest path."""
    from hops_spark.streaming import probe_score_stream

    d = _separable_corpus(spark, n=80)
    w = train_linear_probe(d, dim=32, iters=3)

    src = str(tmp_path / "docs")
    d.select("doc_id", "text").repartition(4) \
     .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    flags = str(tmp_path / "flags")
    q = probe_score_stream(stream, w, flags, str(tmp_path / "ck"),
                           dim=32).start()
    q.processAllAvailable()
    q.stop()

    got = {r["doc_id"]: (r["margin"], r["p_micro"], r["pred"])
           for r in spark.read.parquet(flags).collect()}
    from pyspark.sql import functions as FF
    want = {r["doc_id"]: (r["margin"], r["p_micro"], r["pred"])
            for r in linear_probe_scores(
                d.withColumn("y", FF.lit(0)), w, dim=32).collect()}
    assert got == want and len(want) == 80
