"""Incremental quota maintenance ≡ recompute-from-scratch
(QuotaUpdateManager parity, SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.catalog.cdc import QuotaState, quota_from_scratch


def _log_batch(spark, rows):
    return spark.createDataFrame(
        rows, "tx_id long, inode_id long, parent string, op string, size_delta long")


def test_incremental_equals_scratch(spark):
    b1 = _log_batch(spark, [
        (1, 10, "d1", "ADD", 100), (2, 11, "d1", "ADD", 50),
        (3, 20, "d2", "ADD", 10)])
    b2 = _log_batch(spark, [
        (4, 10, "d1", "UPDATE", 25), (5, 11, "d1", "DELETE", 50),
        (6, 21, "d2", "ADD", 5), (7, 30, "d3", "ADD", 1)])
    b3 = _log_batch(spark, [
        (8, 20, "d2", "DELETE", 10), (9, 30, "d3", "UPDATE", -1)])

    state = QuotaState(spark)
    for b in (b1, b2, b3):
        state.apply_batch(b)
    inc = {r.parent: (r.namespace, r.diskspace) for r in state.snapshot().collect()}

    full = b1.unionByName(b2).unionByName(b3)
    scratch = {r.parent: (r.namespace, r.diskspace)
               for r in quota_from_scratch(full).collect()}
    assert inc == scratch
    assert inc["d1"] == (1, 125)      # 2 adds - 1 delete; 100+50+25-50
    assert inc["d2"] == (1, 5)
    assert inc["d3"] == (1, 0)


def test_cdc_stream_tail(spark, tmp_path):
    """Metadata-log CDC tail drives the same quota state via a stream."""
    from hops_spark.catalog.cdc import tail_metadata_log
    log_dir = str(tmp_path / "mlog")
    b = _log_batch(spark, [(1, 10, "d1", "ADD", 7), (2, 11, "d2", "ADD", 3)])
    b.write.mode("overwrite").parquet(log_dir)

    stream = tail_metadata_log(log_dir, spark, b.schema)
    state = QuotaState(spark)
    q = (stream.writeStream.foreachBatch(lambda df, eid: state.apply_batch(df, eid))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.parent: (r.namespace, r.diskspace) for r in state.snapshot().collect()}
    assert got == {"d1": (1, 7), "d2": (1, 3)}
