"""Weighted (tf-aware) Jaccard dedup semantics (ops/dedup.weighted_*).

The oracle query certifies Spark ≡ DuckDB end-to-end; these pin the
semantics against a plain-Python reference and the cases where
weighted and set Jaccard genuinely disagree.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

import hops_spark.ops.dedup as D


def _py_weighted_jaccard(a: str, b: str) -> float:
    ca, cb = Counter(a.lower().split()), Counter(b.lower().split())
    inter = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return inter / union


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0/1: same vocabulary, same tf profile -> high weighted
        (0, "alpha beta gamma alpha beta gamma delta epsilon zeta eta"),
        (1, "alpha beta gamma alpha beta gamma delta epsilon zeta theta"),
        # 2/3: identical VOCAB but wildly different tf mass ->
        # set Jaccard = 1.0, weighted must be much lower
        (2, "spam ham eggs"),
        (3, "spam spam spam spam spam spam spam spam ham eggs"),
        # 4: unrelated
        (4, "completely different words about weather and sailing boats"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_rescore_matches_python_reference(spark, docs):
    tfrows = D.weighted_token_rows(docs)
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (0, 4)], ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["wjac_ppm"]
           for r in D.weighted_jaccard_verify(pairs, tfrows,
                                              threshold_ppm=0).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), ppm in got.items():
        want = int(_py_weighted_jaccard(texts[a], texts[b]) * 1_000_000)
        assert abs(ppm - want) <= 1, (a, b, ppm, want)


def test_weighted_disagrees_with_set_jaccard_on_repetition(spark, docs):
    tfrows = D.weighted_token_rows(docs)
    pairs = spark.createDataFrame([(2, 3)], ["id_a", "id_b"])
    ppm = (D.weighted_jaccard_verify(pairs, tfrows, threshold_ppm=0)
           .collect()[0]["wjac_ppm"])
    # set Jaccard of docs 2/3 is 1.0 (identical vocab); weighted is
    # 3/10 — the semantics the operator exists to provide
    assert ppm == 300_000


def test_end_to_end_finds_tf_twins_not_repetition_pair(spark, docs):
    out = D.weighted_jaccard_pairs(docs, threshold_ppm=700_000,
                                   cache_candidates=False)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in got          # tf twins: weighted 9/11 ≈ 0.818
    assert (2, 3) not in got      # vocab twins, tf mismatch: 0.3
    assert all(4 not in p for p in got)


def test_capped_expansion_bounds_signature_rows(spark):
    """A doc repeating one token 1000x contributes only W_CAP replicas
    to the signature stage — boilerplate can't amplify its own mass."""
    doc = spark.createDataFrame([(0, " ".join(["spam"] * 1000))],
                                ["doc_id", "text"])
    tfrows = D.weighted_token_rows(doc)
    reps = tfrows.withColumn(
        "_r", F.explode(F.sequence(F.lit(0),
                                   F.least(F.col("tf"), F.lit(D.W_CAP)) - 1)))
    assert reps.count() == D.W_CAP


def test_zero_cap_rejected(spark, docs):
    """w_cap=0 would hit F.sequence's count-DOWN behavior and emit
    garbage replicas — must raise instead."""
    tfrows = D.weighted_token_rows(docs)
    with pytest.raises(ValueError, match="w_cap"):
        D.weighted_minhash_signatures(tfrows, w_cap=0)


def test_weighted_jaccard_property_random_docs(spark):
    """Hypothesis-style randomized check (fixed md5-derived corpus so
    the test is deterministic): the relational rescore equals the
    Counter reference on 40 random multiset docs, including empty-
    intersection and identical pairs."""
    import hashlib

    docs = []
    for i in range(40):
        h = hashlib.md5(f"doc{i}".encode()).hexdigest()
        words = []
        for j, ch in enumerate(h[:12]):
            words += [f"w{int(ch, 16) % 8}"] * (1 + (int(ch, 16) + j) % 3)
        docs.append((i, " ".join(words)))
    docs.append((40, docs[0][1]))             # identical twin of doc 0
    docs.append((41, "zz yy xx"))             # disjoint vocab
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tfrows = D.weighted_token_rows(df)
    import itertools
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(42), 2)
         if (a * 7 + b) % 11 == 0] + [(0, 40), (0, 41)],
        ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["wjac_ppm"]
           for r in D.weighted_jaccard_verify(pairs, tfrows,
                                              threshold_ppm=0).collect()}
    texts = dict(docs)
    for (a, b), ppm in got.items():
        want = int(_py_weighted_jaccard(texts[a], texts[b]) * 1_000_000)
        assert abs(ppm - want) <= 1, (a, b, ppm, want)
    assert got[(0, 40)] == 1_000_000           # identical docs
    assert got[(0, 41)] == 0                   # disjoint vocab
