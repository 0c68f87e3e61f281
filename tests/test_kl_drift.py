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


def test_chunk_windows_cover_and_overlap(spark):
    """Chunking invariants on varied doc lengths: every token position
    is covered, consecutive chunks overlap by exactly window - stride
    (except a clamped final chunk), and chunk 0 starts at token 0."""
    import pyspark.sql.functions as F

    from hops_spark.ops.text import chunk_token_windows

    W, S = 8, 6
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)))
         for i, n in enumerate([1, 7, 8, 9, 14, 15, 20, 100])],
        ["doc_id", "text"])
    rows = (chunk_token_windows(docs, "doc_id", "text", W, S)
            .orderBy("doc_id", "chunk_id").collect())
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["tok"]))
    lengths = [1, 7, 8, 9, 14, 15, 20, 100]
    for doc_id, n in enumerate(lengths):
        chunks = by_doc[doc_id]
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        toks = [f"t{j}" for j in range(n)]
        covered = set()
        for k, tok in chunks:
            assert tok == toks[k * S: k * S + W]
            covered.update(range(k * S, min(k * S + W, n)))
        assert covered == set(range(n)), f"doc {doc_id} not fully covered"
        # one chunk iff n <= W; otherwise ceil((n-W)/S)+1
        want = 1 if n <= W else -(-(n - W) // S) + 1
        assert len(chunks) == want


def test_chunk_windows_rejects_bad_params(spark):
    import pytest as _pytest

    from hops_spark.ops.text import chunk_token_windows

    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_token_windows(docs, window=0)
    with _pytest.raises(ValueError):
        chunk_token_windows(docs, stride=0)


def test_chunk_windows_works_on_streams(spark, sf_dir):
    """chunk_token_windows is stateless array arithmetic — it must run
    UNCHANGED on a document stream and emit exactly the batch chunks
    (the RAG ingest shape: chunk arriving docs continuously, feed the
    embedding/indexing stages)."""
    import pyspark.sql.functions as F

    from hops_spark.io.readers import load_table
    from hops_spark.ops.text import chunk_token_windows
    from hops_spark.streaming import read_documents_stream

    st = (chunk_token_windows(read_documents_stream(spark, sf_dir))
          .select("doc_id", "chunk_id",
                  F.md5(F.concat_ws(" ", "tok")).alias("digest")))
    q = (st.writeStream.format("memory").queryName("chunkstream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["doc_id"], r["chunk_id"]): r["digest"]
           for r in spark.sql("SELECT * FROM chunkstream").collect()}
    d = load_table(spark, sf_dir, "documents")
    want = {(r["doc_id"], r["chunk_id"]): r["digest"]
            for r in chunk_token_windows(d)
            .select("doc_id", "chunk_id",
                    F.md5(F.concat_ws(" ", "tok")).alias("digest"))
            .collect()}
    assert got == want
