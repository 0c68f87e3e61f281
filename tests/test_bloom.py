"""Counting/Dynamic bloom grid semantics: exact cell-wise mergeability
(the property that makes the filter distributable) and full-output
parity with a pure-Python model of the reference contract."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.ops import bloom as B

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

M, K = 64, 3


def _model_positions(key: str, m: int = M, k: int = K,
                     seed: str = "bloom") -> list[int]:
    return [int(hashlib.md5(f"{seed}|{key}|{i}".encode())
                .hexdigest()[:15], 16) % m for i in range(k)]


def _model_grid(updates: list[tuple[str, int]]) -> dict[int, int]:
    g: dict[int, int] = {}
    for key, w in updates:
        for p in _model_positions(key):
            g[p] = g.get(p, 0) + w
    return {p: c for p, c in g.items() if c != 0}


@SET
@given(updates=st.lists(
    st.tuples(st.text("abcxyz", min_size=1, max_size=4),
              st.sampled_from([1, -1])),
    min_size=0, max_size=20),
    split=st.integers(0, 20))
def test_counting_grid_matches_model_and_merges_exactly(spark, updates, split):
    """grid(all) == model, and grid(a) ⊕ grid(b) == grid(a+b) for any
    split of the update stream — the distributability contract."""
    def mk(rows):
        if not rows:
            return spark.createDataFrame([("x", 0)], "key string, w int") \
                        .filter("w <> 0")
        return spark.createDataFrame(rows, "key string, w int")

    whole = B.counting_grid(mk(updates), "key", M, K, weight_col="w")
    got = {r["pos"]: r["cnt"] for r in whole.collect()}
    assert got == _model_grid(updates)

    a, b = updates[:split], updates[split:]
    merged = B.merge_grids(B.counting_grid(mk(a), "key", M, K, weight_col="w"),
                           B.counting_grid(mk(b), "key", M, K, weight_col="w"))
    assert {r["pos"]: r["cnt"] for r in merged.collect()} == got


def test_counting_membership_add_delete_contract(spark):
    """Insert a,b,c twice and delete one copy of b, all of c: member
    = all-k-cells >= 1; approx_cnt is the min-counter estimate (>= true
    count is NOT guaranteed after collisions, equality holds when cells
    are collision-free, which this keyset is checked to be)."""
    keys = ["alpha", "bravo", "delta"]
    cells = [p for k_ in keys for p in _model_positions(k_, 512)]
    assert len(set(cells)) == len(cells), "fixture keys must not collide"
    updates = [(k_, 1) for k_ in keys] + [(k_, 1) for k_ in keys] \
        + [("bravo", -1)] + [("delta", -1), ("delta", -1)]
    df = spark.createDataFrame(updates, "key string, w int")
    grid = B.counting_grid(df, "key", 512, K, weight_col="w")
    probes = spark.createDataFrame(
        [(k_,) for k_ in keys + ["ghost"]], "probe_key string")
    got = {r["probe_key"]: (r["member"], r["approx_cnt"])
           for r in B.counting_membership(grid, probes, "probe_key",
                                          512, K).collect()}
    assert got["alpha"] == (1, 2)
    assert got["bravo"] == (1, 1)
    assert got["delta"] == (0, 0)
    assert got["ghost"] == (0, 0)


def test_dynamic_bloom_epochs_and_membership(spark):
    """nr=10 inserts/filter over 35 unique keys -> 4 epochs; every
    inserted key is a member; epochs_hit >= 1 for members."""
    rows = [(f"k{i:03d}", i) for i in range(35)]
    ins = spark.createDataFrame(rows, "key string, seq int")
    bits = B.dynamic_bloom_bits(ins, "key", "seq", nr=10, m=2048, k=K)
    assert {r["epoch"] for r in bits.select("epoch").distinct().collect()} \
        == {0, 1, 2, 3}
    probes = spark.createDataFrame(
        [("k000",), ("k012",), ("k034",), ("nope",)], "probe_key string")
    got = {r["probe_key"]: (r["member"], r["epochs_hit"])
           for r in B.dynamic_membership(bits, probes, "probe_key",
                                         2048, K).collect()}
    for k_ in ("k000", "k012", "k034"):
        assert got[k_][0] == 1 and got[k_][1] >= 1
    # 'nope' may false-positive only if all K cells collide in one
    # epoch; with m=2048 and 10 keys/epoch that would be a bug.
    assert got["nope"] == (0, 0)


def test_retouched_bloom_clears_fp_with_minimum_damage(spark):
    """RetouchedBloomFilter: after retouching, the named false positive
    is gone; collateral false negatives are exactly the inserted keys
    sharing the cleared (minimum-usage) cell."""
    inserts = spark.createDataFrame(
        [(k_, 1) for k_ in ("alpha", "bravo", "delta")], "key string, w int")
    grid = B.counting_grid(inserts, "key", 512, K)
    fp = spark.createDataFrame([("ghostfp",)], "key string")
    retouched = B.retouch_grid(grid, inserts.select("key"), fp,
                               "key", 512, K)
    # exactly one cell cleared
    before = {r["pos"] for r in grid.collect()}
    after = {r["pos"] for r in retouched.collect()}
    cleared = before - after
    assert len(cleared) <= 1
    # the FP key now fails membership on the retouched grid
    probes = spark.createDataFrame(
        [("ghostfp",), ("alpha",), ("bravo",), ("delta",)],
        "probe_key string")
    got = {r["probe_key"]: r["member"] for r in
           B.counting_membership(retouched, probes, "probe_key",
                                 512, K).collect()}
    assert got["ghostfp"] == 0
    # collateral: only keys whose cells include the cleared cell flip
    damaged = {k_ for k_ in ("alpha", "bravo", "delta")
               if cleared & set(_model_positions(k_, 512))}
    for k_ in ("alpha", "bravo", "delta"):
        assert got[k_] == (0 if k_ in damaged else 1)


def test_streaming_bloom_grid_equals_batch(spark, sf_dir):
    """The streaming counting-bloom grid (bounded m-row state) must
    equal the batch grid over the same documents after the stream
    drains — the mergeability property live in Structured Streaming."""
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table
    from hops_spark.streaming import (bloom_grid_stream,
                                      read_documents_stream,
                                      run_to_completion)

    key = "doc_key"
    docs_stream = read_documents_stream(spark, sf_dir).select(
        F.concat_ws("_", F.lit("doc"), F.col("doc_id").cast("string"))
         .alias(key))
    got = {r["pos"]: r["cnt"] for r in run_to_completion(
        bloom_grid_stream(docs_stream, key, 256, K),
        "bloom_grid_stream_test").collect()}

    batch = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("_", F.lit("doc"), F.col("doc_id").cast("string"))
         .alias(key))
    want = {r["pos"]: r["cnt"] for r in
            B.counting_grid(batch, key, 256, K).collect()}
    assert got == want and len(got) <= 256


def test_bloom_join_filter_no_false_negatives(spark):
    """The bloom-join pre-filter NEVER drops a true match (pass is a
    superset of membership), and the literal-bitmask bit test agrees
    exactly with grid-based membership for every probe."""
    from pyspark.sql import functions as F

    from hops_spark.ops.bloom import (bloom_bitmask, bloom_join_filter,
                                      bloom_positions, counting_grid)

    m, k = 512, 3
    dim = spark.range(0, 40).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("key"))
    probes = spark.range(0, 400).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("key"))
    mask = bloom_bitmask(dim, "key", m, k, seed="bjoin")
    passed = bloom_join_filter(F.col("key"), mask, m, k, seed="bjoin")
    got = {r["key"]: r["p"] for r in
           probes.select("key", passed.alias("p")).collect()}
    # every dim key passes (no false negatives)
    assert all(got[f"s{i}"] for i in range(40))
    # bitmask test == grid-membership test for every probe
    grid = counting_grid(dim, "key", m, k, seed="bjoin")
    grid_pos = {r["pos"] for r in grid.collect()}
    exp = {r["key"]: all(p in grid_pos for p in r["ps"]) for r in
           probes.select("key", bloom_positions(
               F.col("key"), m, k, "bjoin").alias("ps")).collect()}
    assert got == exp
