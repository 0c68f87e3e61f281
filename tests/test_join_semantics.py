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


# --- CompositeInputFormat join expression language (Parser.java:75) ---------

def _write_kv(spark, tmp_path, name, rows):
    df = spark.createDataFrame(rows, "key int, " + f"{name} string")
    p = str(tmp_path / name)
    df.write.parquet(p)
    return p


def test_join_expr_inner_outer_nested(spark, tmp_path):
    from hops_spark.ops.join_expr import join_expr

    pa = _write_kv(spark, tmp_path, "a", [(1, "a1"), (2, "a2")])
    pb = _write_kv(spark, tmp_path, "b", [(2, "b2"), (3, "b3")])
    pc = _write_kv(spark, tmp_path, "c", [(2, "c2"), (9, "c9")])

    inner = join_expr(spark, f'inner(tbl(parquet,"{pa}"), tbl(parquet,"{pb}"))')
    assert [tuple(r) for r in inner.collect()] == [(2, "a2", "b2")]

    nested = join_expr(
        spark,
        f'outer(inner(tbl(parquet,"{pa}"), tbl(parquet,"{pb}")), tbl(parquet,"{pc}"))')
    got = {tuple(r) for r in nested.collect()}
    # inner(a,b) = {2}; outer with c adds key 9 with null slots
    assert got == {(2, "a2", "b2", "c2"), (9, None, None, "c9")}


def test_join_expr_override_rightmost(spark, tmp_path):
    from hops_spark.ops.join_expr import join_expr

    pa = _write_kv(spark, tmp_path, "v", [(1, "left1"), (2, "left2")])
    pb = str(tmp_path / "v2")
    spark.createDataFrame([(2, "right2")], "key int, v string").write.parquet(pb)
    out = join_expr(spark, f'override(tbl(parquet,"{pa}"), tbl(parquet,"{pb}"))')
    got = {(r.key, r.v) for r in out.collect()}
    assert got == {(1, "left1"), (2, "right2")}


def test_join_expr_user_defined_and_errors(spark, tmp_path):
    import pytest
    from hops_spark.ops.join_expr import define, join_expr

    pa = _write_kv(spark, tmp_path, "x", [(1, "x1"), (2, "x2")])
    pb = _write_kv(spark, tmp_path, "y", [(2, "y2")])

    define("semi", lambda key, dfs: dfs[0].join(dfs[1].select(key), key, "left_semi"))
    out = join_expr(spark, f'semi(tbl(parquet,"{pa}"), tbl(parquet,"{pb}"))')
    assert [(r.key, r.x) for r in out.collect()] == [(2, "x2")]

    with pytest.raises(ValueError, match="unknown join op"):
        join_expr(spark, f'bogus(tbl(parquet,"{pa}"))')
    with pytest.raises(ValueError):
        join_expr(spark, f'inner(tbl(parquet,"{pa}")')  # unbalanced
