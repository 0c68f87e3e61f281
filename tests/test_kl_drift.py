"""Corpus KL-drift monitor semantics (ops/lm.corpus_kl_drift)."""

from __future__ import annotations

import pytest

from hops_spark.ops.lm import corpus_kl_drift


@pytest.fixture(scope="module")
def base_docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_identical_corpora_drift_is_zero(spark, base_docs):
    out = corpus_kl_drift(base_docs, base_docs).collect()
    assert out, "vocab should be non-empty"
    # p == q for every token → every log-ratio is exactly ln(1) = 0
    assert all(r["lr_micro"] == 0 for r in out)
    assert out[0]["kl_total_micro"] == 0


def test_flood_token_ranks_first(spark, base_docs):
    flood = spark.createDataFrame(
        [(100 + i, "casino casino casino casino bonus") for i in range(20)],
        ["doc_id", "text"])
    cur = base_docs.union(flood)
    out = corpus_kl_drift(base_docs, cur).collect()
    # the flooded token dominates the drift contribution and the total
    # KL is strictly positive
    assert out[0]["token"] == "casino"
    assert out[0]["c_ref"] == 0 and out[0]["c_cur"] == 80
    assert out[0]["kl_total_micro"] > 0


def test_drift_is_directional(spark, base_docs):
    """KL(cur || ref) weighs by CURRENT mass: a token that vanished
    contributes far less than one that flooded in at the same count."""
    flood = spark.createDataFrame(
        [(100 + i, "casino casino casino casino bonus") for i in range(20)],
        ["doc_id", "text"])
    cur = base_docs.union(flood)
    kl_in = corpus_kl_drift(base_docs, cur).collect()[0]["kl_total_micro"]
    kl_out = corpus_kl_drift(cur, base_docs).collect()[0]["kl_total_micro"]
    assert kl_in > kl_out


def test_streaming_counts_give_batch_identical_kl(spark, sf_dir):
    """The streaming face: token_count_stream's running counts, fed to
    kl_from_counts against a frozen reference, equal the batch
    corpus_kl_drift over the same files — row-for-row."""
    import pyspark.sql.functions as F

    from hops_spark.io.readers import load_table
    from hops_spark.ops.lm import kl_from_counts
    from hops_spark.ops.text import words
    from hops_spark.streaming import read_documents_stream, token_count_stream

    st = token_count_stream(read_documents_stream(spark, sf_dir))
    q = (st.writeStream.format("memory").queryName("tokcounts")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    cur_counts = spark.sql("SELECT token, c_cur FROM tokcounts")

    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 2 == 0)
    ref_counts = (ref.select(F.explode(words("text")).alias("token"))
                     .groupBy("token")
                     .agg(F.count("*").cast("long").alias("c_ref")))

    got = kl_from_counts(ref_counts, cur_counts).collect()
    from hops_spark.ops.lm import corpus_kl_drift as batch_drift
    want = batch_drift(ref, d).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
