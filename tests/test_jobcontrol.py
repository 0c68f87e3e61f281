"""JobControl DAG runner (reference JobControl.java / ControlledJob.java
state machine): dependency order, failure propagation, cycle detection,
and a Spark end-to-end diamond."""

from __future__ import annotations

import pytest

from hops_spark.jobcontrol import JobControl, State


def test_diamond_runs_in_dependency_order():
    order = []
    jc = JobControl()
    jc.add_step("a", lambda deps: order.append("a") or 1)
    jc.add_step("b", lambda deps: order.append("b") or deps["a"] + 1, ["a"])
    jc.add_step("c", lambda deps: order.append("c") or deps["a"] * 10, ["a"])
    jc.add_step("d", lambda deps: order.append("d") or deps["b"] + deps["c"],
                ["b", "c"])
    states = jc.run()
    assert states == {k: "SUCCESS" for k in "abcd"}
    assert order == ["a", "b", "c", "d"]
    assert jc.results()["d"] == 12


def test_failure_marks_transitive_dependents_without_running_them():
    ran = []
    jc = JobControl()
    jc.add_step("ok", lambda d: ran.append("ok"))
    jc.add_step("boom", lambda d: 1 / 0)
    jc.add_step("child", lambda d: ran.append("child"), ["boom"])
    jc.add_step("grandchild", lambda d: ran.append("grandchild"), ["child"])
    jc.add_step("side", lambda d: ran.append("side"), ["ok"])
    states = jc.run()
    assert states == {"ok": "SUCCESS", "boom": "FAILED",
                      "child": "DEPENDENT_FAILED",
                      "grandchild": "DEPENDENT_FAILED",
                      "side": "SUCCESS"}
    assert ran == ["ok", "side"]
    assert isinstance(jc.steps["boom"].error, ZeroDivisionError)


def test_unknown_dep_and_duplicate_rejected():
    jc = JobControl()
    jc.add_step("a", lambda d: None)
    with pytest.raises(ValueError, match="unknown"):
        jc.add_step("b", lambda d: None, ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        jc.add_step("a", lambda d: None)


def test_spark_diamond_end_to_end(spark, sf_dir, tmp_path):
    """Two branch aggregations over one materialized base, joined by the
    sink step — the genuine JobControl use case (materialization
    boundary feeding multiple consumers)."""
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table

    jc = JobControl()
    jc.add_step("base", lambda d: load_table(spark, sf_dir, "orders")
                .select("o_custkey", "o_totalprice").localCheckpoint())
    jc.add_step("sums", lambda d: d["base"].groupBy("o_custkey")
                .agg(F.round(F.sum("o_totalprice"), 2).alias("total")),
                ["base"])
    jc.add_step("counts", lambda d: d["base"].groupBy("o_custkey")
                .agg(F.count("*").alias("n")), ["base"])
    jc.add_step("sink", lambda d: d["sums"].join(d["counts"], "o_custkey")
                .write.mode("overwrite").parquet(str(tmp_path / "out")),
                ["sums", "counts"])
    assert set(jc.run().values()) == {"SUCCESS"}
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.columns == ["o_custkey", "total", "n"]
    assert out.count() == load_table(spark, sf_dir, "orders") \
        .select("o_custkey").distinct().count()


def test_cycle_detected():
    jc = JobControl()
    jc.add_step("a", lambda d: None)
    # build a cycle by hand (add_step can't express one forward)
    jc.steps["a"].deps = ("b",)
    from hops_spark.jobcontrol import ControlledStep
    jc.steps["b"] = ControlledStep(name="b", fn=lambda d: None, deps=("a",))
    with pytest.raises(RuntimeError, match="cycle"):
        jc.run()


def test_state_enum_is_reference_shaped():
    assert {s.value for s in State} == {
        "WAITING", "RUNNING", "SUCCESS", "FAILED", "DEPENDENT_FAILED"}
