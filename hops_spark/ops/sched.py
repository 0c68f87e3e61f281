"""Scheduler-policy replay over job traces — the SLS row of SURVEY §2.10
(hadoop-tools/hadoop-sls/.../SLSRunner.java: replay a rumen/SLS trace
under a scheduler policy and report per-queue waiting/runtime metrics).

The reference runs a real YARN scheduler against virtual clock events.
The analytics-engine re-expression replays the POLICY CONTRACT as a
dataframe computation over the same traces (tools/gridmix_replay.py
parses rumen-shaped JSON into exactly this trace schema):

- ``fifo_schedule``: per-queue serial FIFO (one job at a time per
  queue — the sequential baseline SLS's FIFO comparison uses). The
  recurrence finish_i = max(submit_i, finish_{i-1}) + dur_i looks
  inherently sequential, but in max-plus form it is a prefix scan:
  finish_i = cumdur_i + max_{j<=i}(submit_j - cumdur_{j-1}), so two
  windowed passes PARTITIONED BY QUEUE compute it — no driver loop, no
  single-partition window; queues replay in parallel, 10^8-job traces
  hold.
- ``capacity_schedule``: per-queue dedicated capacity of ``slots``
  concurrent containers (the fair/capacity-scheduler shape: each queue
  owns a guaranteed share and schedules FIFO within it). An exact
  event-driven heap simulation per queue via applyInPandas — state is
  one heap of ``slots`` finish times, grouped by queue so the
  simulation parallelizes across queues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fifo_schedule(trace: DataFrame, queue_col: str = "queue",
                  submit_col: str = "submit_s", dur_col: str = "dur_s",
                  id_col: str = "job_id") -> DataFrame:
    """Per-queue serial FIFO replay: adds start_s / finish_s / wait_s.

    Jobs run in (submit, id) order, one at a time per queue:
    ``finish_i = max(submit_i, finish_{i-1}) + dur_i``. Computed in
    closed max-plus form with two cumulative windows over the same
    queue-partitioned ordering (one sort, two scans)."""
    w = (Window.partitionBy(queue_col).orderBy(submit_col, id_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    t = trace.withColumn("_cumdur", F.sum(dur_col).over(w))
    # _base_j = submit_j - cumdur_{j-1}: the queue idles up to the max
    # over all earlier _base; adding back cumdur_i gives the finish.
    t = t.withColumn("_base",
                     F.col(submit_col) - (F.col("_cumdur") - F.col(dur_col)))
    t = t.withColumn("_peak", F.max("_base").over(w))
    return (t.withColumn("finish_s",
                         (F.col("_cumdur") + F.col("_peak")).cast("long"))
             .withColumn("start_s",
                         (F.col("finish_s") - F.col(dur_col)).cast("long"))
             .withColumn("wait_s",
                         (F.col("start_s") - F.col(submit_col)).cast("long"))
             .drop("_cumdur", "_base", "_peak"))


def capacity_schedule(trace: DataFrame, slots: int,
                      queue_col: str = "queue", submit_col: str = "submit_s",
                      dur_col: str = "dur_s", id_col: str = "job_id"
                      ) -> DataFrame:
    """Per-queue capacity-``slots`` FIFO replay (each queue owns a
    guaranteed share — the capacity/fair-scheduler contract SLS
    compares against FIFO). Exact event-driven simulation: per queue a
    heap of ``slots`` finish times; each job (in submit, id order)
    starts at max(submit, earliest-free-slot). applyInPandas per queue:
    queue simulations are independent and run in parallel; the SIM
    state is O(slots), but applyInPandas materializes each queue's
    trace rows in executor memory — fine for scheduler traces (10^5-6
    jobs/queue), and the closed-form fifo_schedule is the path that
    needs no per-group materialization at all."""
    import heapq

    import pandas as pd

    out_schema = (trace.select(id_col, queue_col, submit_col, dur_col)
                  .schema.add("start_s", "long").add("finish_s", "long")
                  .add("wait_s", "long"))

    def sim(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([submit_col, id_col]).reset_index(drop=True)
        heap = [0] * slots
        heapq.heapify(heap)
        starts, finishes = [], []
        for submit, dur in zip(pdf[submit_col], pdf[dur_col]):
            free = heapq.heappop(heap)
            start = max(int(submit), free)
            fin = start + int(dur)
            heapq.heappush(heap, fin)
            starts.append(start)
            finishes.append(fin)
        pdf = pdf[[id_col, queue_col, submit_col, dur_col]].copy()
        pdf["start_s"] = starts
        pdf["finish_s"] = finishes
        pdf["wait_s"] = pdf["start_s"] - pdf[submit_col]
        return pdf

    return (trace.select(id_col, queue_col, submit_col, dur_col)
                 .groupBy(queue_col).applyInPandas(sim, out_schema))


def queue_stats(scheduled: DataFrame, queue_col: str = "queue",
                submit_col: str = "submit_s", dur_col: str = "dur_s"
                ) -> DataFrame:
    """Per-queue replay report (the SLS output surface): job count,
    makespan, total busy time, total/max waiting time — all integer
    seconds (hash-portable)."""
    return (scheduled.groupBy(queue_col)
            .agg(F.count("*").alias("n_jobs"),
                 (F.max("finish_s") - F.min(submit_col)).cast("long")
                  .alias("makespan_s"),
                 F.sum(dur_col).cast("long").alias("busy_s"),
                 F.sum("wait_s").cast("long").alias("tot_wait_s"),
                 F.max("wait_s").cast("long").alias("max_wait_s"))
            .orderBy(queue_col))
