"""Pigeonhole edit-distance join: exact equivalence to brute-force
levenshtein on arbitrary inputs (no false positives by construction —
the verify step — and no false negatives by the pigeonhole guarantee)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.ops.editjoin import edit_distance_pairs

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@SET
@given(words=st.lists(st.text("abcd", min_size=1, max_size=12),
                      min_size=2, max_size=30),
       tau=st.integers(1, 3))
def test_edit_distance_pairs_equals_bruteforce(spark, words, tau):
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, "id", "s", tau=tau).collect()}
    want = {(i, j): _lev(a, b)
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= tau}
    assert got == want


def test_edit_distance_pairs_respects_blocks(spark):
    """block_col scopes candidate generation: equal strings in
    different blocks are NOT paired."""
    df = spark.createDataFrame(
        [(1, "g1", "abc"), (2, "g1", "abd"), (3, "g2", "abc")],
        "id long, blk string, s string")
    got = {(r["id_a"], r["id_b"]) for r in
           edit_distance_pairs(df, "id", "s", tau=2,
                               block_col="blk").collect()}
    assert got == {(1, 2)}
