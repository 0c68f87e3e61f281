"""Join-language semantics on controlled KV fixtures — mirrors the
reference's TestJoinDatamerge (overlapping / disjoint / duplicate keys,
incl. the duplicate-key override case from SURVEY §7.4.3)."""

from __future__ import annotations

from hops_spark.ops import join as J


def _kv(spark, rows):
    return spark.createDataFrame(rows, "key int, v int")


def test_inner_requires_all_sources(spark):
    a = _kv(spark, [(1, 10), (2, 20), (3, 30)])
    b = _kv(spark, [(2, 200), (3, 300), (4, 400)])
    got = {(r.key, r.s0_v, r.s1_v) for r in J.inner_join("key", a, b).collect()}
    assert got == {(2, 20, 200), (3, 30, 300)}


def test_inner_duplicate_keys_cross_product(spark):
    a = _kv(spark, [(1, 10), (1, 11)])
    b = _kv(spark, [(1, 100), (1, 101)])
    assert J.inner_join("key", a, b).count() == 4


def test_outer_any_source(spark):
    a = _kv(spark, [(1, 10), (2, 20)])
    b = _kv(spark, [(2, 200), (3, 300)])
    got = {(r.key, r.s0_v, r.s1_v) for r in J.outer_join("key", a, b).collect()}
    assert got == {(1, 10, None), (2, 20, 200), (3, None, 300)}


def test_override_rightmost_wins(spark):
    a = _kv(spark, [(1, 10), (2, 20), (3, 30)])
    b = _kv(spark, [(2, 200), (4, 400)])
    c = _kv(spark, [(2, 2000)])
    got = {(r.key, r.v) for r in J.override_join("key", ["v"], a, b, c).collect()}
    assert got == {(1, 10), (2, 2000), (3, 30), (4, 400)}


def test_override_rows_duplicate_keys(spark):
    """Dup-key semantics: ALL rows of the rightmost source holding the
    key; other sources' rows for that key are dropped entirely."""
    a = _kv(spark, [(1, 10), (1, 11), (2, 20)])
    b = _kv(spark, [(1, 100), (1, 101)])
    got = sorted((r.key, r.v) for r in J.override_rows("key", a, b).collect())
    assert got == [(1, 100), (1, 101), (2, 20)]


def test_semi_anti(spark):
    a = _kv(spark, [(1, 10), (2, 20), (3, 30)])
    b = _kv(spark, [(2, 0)])
    assert {r.key for r in J.semi_join(a, b, "key").collect()} == {2}
    assert {r.key for r in J.anti_join(a, b, "key").collect()} == {1, 3}


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 250), (2, 50)], "k int, lts long")
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b"), (1, 300, "c"), (2, 60, "z")],
        "k int, rts long, val string")
    got = J.asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    rows = {(r.k, r.lts, r.val) for r in got.collect()}
    # k=1 @100 → 'a' (90); k=1 @250 → 'b' (200); k=2 @50 → none ≤ 50
    assert rows == {(1, 100, "a"), (1, 250, "b"), (2, 50, None)}


def test_broadcast_join_plan(spark):
    a = _kv(spark, [(i, i) for i in range(100)])
    b = _kv(spark, [(1, 1)])
    plan = J.broadcast_join(a, b, "key")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
