"""Scheduler replay semantics: the closed-form max-plus FIFO must equal
an event-driven Python simulation on arbitrary traces, and the
capacity-slots variant must reduce to FIFO at slots=1 and dominate it
(no later finishes) at slots>1."""

from __future__ import annotations

import heapq

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.ops.sched import capacity_schedule, fifo_schedule, queue_stats

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

_trace = st.lists(
    st.tuples(st.integers(0, 2),          # queue
              st.integers(0, 50),         # submit
              st.integers(1, 20)),        # duration
    min_size=1, max_size=25)


def _model(rows, slots=1):
    """Heap-based per-queue capacity simulation (ground truth)."""
    out = {}
    by_q: dict[int, list] = {}
    for jid, (q, sub, dur) in enumerate(rows):
        by_q.setdefault(q, []).append((sub, jid, dur))
    for q, jobs in by_q.items():
        heap = [0] * slots
        heapq.heapify(heap)
        for sub, jid, dur in sorted(jobs):
            start = max(sub, heapq.heappop(heap))
            heapq.heappush(heap, start + dur)
            out[jid] = (start, start + dur)
    return out


@SET
@given(rows=_trace)
def test_fifo_maxplus_equals_event_simulation(spark, rows):
    df = spark.createDataFrame(
        [(i, f"q{q}", s, d) for i, (q, s, d) in enumerate(rows)],
        "job_id long, queue string, submit_s long, dur_s long")
    got = {r["job_id"]: (r["start_s"], r["finish_s"])
           for r in fifo_schedule(df).collect()}
    assert got == _model(rows, slots=1)


@SET
@given(rows=_trace, slots=st.integers(1, 3))
def test_capacity_schedule_equals_heap_model(spark, rows, slots):
    df = spark.createDataFrame(
        [(i, f"q{q}", s, d) for i, (q, s, d) in enumerate(rows)],
        "job_id long, queue string, submit_s long, dur_s long")
    got = {r["job_id"]: (r["start_s"], r["finish_s"])
           for r in capacity_schedule(df, slots).collect()}
    assert got == _model(rows, slots=slots)


def test_more_slots_never_hurt_and_stats_shape(spark):
    rows = [(0, 0, 10), (0, 1, 10), (0, 2, 10), (1, 0, 5), (1, 0, 5)]
    df = spark.createDataFrame(
        [(i, f"q{q}", s, d) for i, (q, s, d) in enumerate(rows)],
        "job_id long, queue string, submit_s long, dur_s long")
    f1 = {r["job_id"]: r["finish_s"] for r in fifo_schedule(df).collect()}
    f2 = {r["job_id"]: r["finish_s"]
          for r in capacity_schedule(df, 2).collect()}
    assert all(f2[j] <= f1[j] for j in f1)
    stats = {r["queue"]: r.asDict() for r in
             queue_stats(fifo_schedule(df)).collect()}
    assert stats["q0"]["n_jobs"] == 3 and stats["q0"]["makespan_s"] == 30
    assert stats["q0"]["tot_wait_s"] == 9 + 18
    assert stats["q1"]["max_wait_s"] == 5
