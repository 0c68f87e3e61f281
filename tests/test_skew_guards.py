"""Adversarial-skew guards: a boilerplate-heavy corpus (many identical
documents/vectors) must NOT produce quadratic candidate blowups — the
bucket caps drop pathological buckets, and the span detector is
structurally linear. These are the 100 TB failure modes; the caps are
part of each op's declared semantics (mirrored in the oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.ops import dedup as D
from hops_spark.ops import similarity as SIM

BOILER = "the same boilerplate text repeated across the whole corpus again"


def _boiler_docs(spark, n=300, distinct=5):
    rows = [(i, BOILER if i >= distinct else f"unique doc {i} " + " ".join(
        f"w{i}x{j}" for j in range(12))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_drops_boilerplate_bucket(spark):
    d = _boiler_docs(spark)
    sigs = D.minhash_signatures(d, "doc_id", "text", 16, 3)
    pairs = D.minhash_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=50)
    # 295 identical docs share every band bucket -> bucket size 295 > 50
    # -> dropped; candidates only among the 5 unique docs (none share).
    assert pairs.count() == 0


def test_minhash_cap_bounds_candidates(spark):
    d = _boiler_docs(spark)
    sigs = D.minhash_signatures(d, "doc_id", "text", 16, 3)
    pairs = D.minhash_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=1000)
    # under the cap, candidates are the identical-doc clique: C(295,2)
    assert pairs.count() == 295 * 294 // 2


def test_simhash_cap_drops_boilerplate_chunks(spark):
    d = _boiler_docs(spark)
    pairs = D.simhash_near_pairs(d, "doc_id", "text", bits=32,
                                 max_hamming=3, n_tables=4, max_bucket=50)
    assert pairs.count() == 0


def test_embedding_cap_drops_identical_vectors(spark):
    rows = [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(200)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = SIM.embedding_near_dup(e, dim=4, threshold=0.9, n_planes=4,
                                   max_bucket=100)
    assert pairs.count() == 0


def test_duplicate_spans_linear_in_corpus(spark):
    # 200 identical docs: the hot k-grams select one maximal span PER
    # DOC — output rows scale with docs, never with doc pairs.
    d = _boiler_docs(spark, n=200, distinct=0)
    spans = D.duplicate_spans(d, k=3)
    assert spans.count() == 200
    one = spans.filter(F.col("doc_id") == 7).collect()[0]
    n_tokens = len(BOILER.split())
    assert (one["span_start"], one["span_end"]) == (0, n_tokens - 1)


def test_ngram_jaccard_cap_resolves_from_scale_profile(spark):
    """VERDICT r4 nit: the 100-TB-safe shingle-frequency cap must be the
    AMBIENT default under the scale profile, not a footnote. With the
    conf set to 1, every shared shingle is ubiquitous -> zero pairs;
    unset (local default 10000) the duplicate pair is found."""
    from hops_spark.ops.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string")
    assert ngram_jaccard_pairs(docs).count() == 1
    spark.conf.set("spark.hops.dedup.maxShingleFreq", "1")
    try:
        assert ngram_jaccard_pairs(docs).count() == 0
        # explicit argument still overrides the ambient profile
        assert ngram_jaccard_pairs(docs, max_shingle_freq=10).count() == 1
    finally:
        spark.conf.unset("spark.hops.dedup.maxShingleFreq")
