"""Subtree mutation ops (SURVEY §2.11; reference FSNamesystem.java:7398
lockSubtree + batched leaf-first delete/rename transactions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.catalog import cdc
from hops_spark.catalog.metastore import (
    inodes_from_documents, subtree_delete, subtree_members, subtree_rename,
    with_partition_id,
)

SF = "/root/testdata/sf0.001"


def test_subtree_delete_removes_exactly_subtree(spark):
    ino = inodes_from_documents(spark, SF)
    before = ino.count()
    n_sub = subtree_members(ino, "src1").count()
    post, log = subtree_delete(ino, "src1", batch=50)
    assert n_sub > 0
    assert post.count() == before - n_sub
    assert post.filter(F.col("parent") == "src1").count() == 0
    assert log.count() == n_sub
    assert log.select("op").distinct().collect()[0][0] == "DELETE"


def test_subtree_delete_batches_bounded(spark):
    ino = inodes_from_documents(spark, SF)
    _, log = subtree_delete(ino, "src1", batch=7)
    sizes = [r[0] for r in log.groupBy("tx_id").count().select("count").collect()]
    assert max(sizes) <= 7          # PK-range chunk never exceeds batch
    assert len(sizes) >= 2          # actually chunked


def test_subtree_delete_nested_prefix_leaf_first(spark):
    # Two-level tree: dir 'a' has child dir rows under 'a/b'. Leaf level
    # ('a/b', depth 2) must get strictly larger tx ids than 'a' entries.
    rows = [(1, "a", "f1", False, 10), (2, "a", "f2", False, 10),
            (3, "a/b", "g1", False, 10), (4, "a/b", "g2", False, 10),
            (5, "ax", "h1", False, 10)]  # 'ax' must NOT match prefix 'a'
    ino = with_partition_id(spark.createDataFrame(
        rows, "inode_id long, parent string, name string, is_dir boolean, size long"))
    mem = subtree_members(ino, "a")
    assert sorted(r[0] for r in mem.select("inode_id").collect()) == [1, 2, 3, 4]
    post, log = subtree_delete(ino, "a", batch=10)
    assert [r[0] for r in post.select("inode_id").collect()] == [5]
    tx = {r["inode_id"]: r["tx_id"] for r in log.collect()}
    assert tx[3] < tx[1] and tx[4] < tx[2]  # deeper level commits first


def test_subtree_rename_rewrites_prefix_and_partition(spark):
    rows = [(1, "a", "f1", False, 10), (2, "a/b", "g1", False, 10),
            (3, "c", "h1", False, 10)]
    ino = with_partition_id(spark.createDataFrame(
        rows, "inode_id long, parent string, name string, is_dir boolean, size long"))
    post, log = subtree_rename(ino, "a", "z/a2")
    got = {r["inode_id"]: r["parent"] for r in post.collect()}
    assert got == {1: "z/a2", 2: "z/a2/b", 3: "c"}
    # partition ids recomputed to match the rewritten parent
    expect = {r["parent"]: r["partition_id"]
              for r in with_partition_id(post).collect()}
    for r in post.collect():
        assert r["partition_id"] == expect[r["parent"]]
    assert log.count() == 2
    assert log.select("op").distinct().collect()[0][0] == "RENAME"


def test_subtree_delete_feeds_quota_cdc(spark):
    # The delete log drives cdc.quota_deltas: src1's namespace delta is
    # -n_files and diskspace delta is -total_bytes.
    ino = inodes_from_documents(spark, SF)
    stats = (subtree_members(ino, "src1")
             .agg(F.count("*"), F.sum("size")).collect()[0])
    _, log = subtree_delete(ino, "src1", batch=100)
    deltas = cdc.quota_deltas(log)
    row = deltas.filter(F.col("parent") == "src1").collect()[0]
    assert row["ns_delta"] == -stats[0]
    assert row["ds_delta"] == -stats[1]


def test_ancestor_rollup_deep_tree(spark):
    """du over a nested tree: every ancestor accumulates its subtree."""
    from hops_spark.catalog.metastore import ancestor_rollup, with_partition_id

    rows = [(1, "a", "f1", False, 10), (2, "a/b", "f2", False, 20),
            (3, "a/b/c", "f3", False, 40), (4, "d", "f4", False, 5)]
    ino = with_partition_id(spark.createDataFrame(
        rows, "inode_id long, parent string, name string, is_dir boolean, size long"))
    got = {r["dir"]: (r["n_files"], r["total_bytes"])
           for r in ancestor_rollup(ino).collect()}
    assert got == {"a": (3, 70), "a/b": (2, 60), "a/b/c": (1, 40), "d": (1, 5)}
