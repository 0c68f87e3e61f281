"""Rumen trace ingestion (hadoop-tools/hadoop-rumen TraceBuilder.java:51
output shape) for the gridmix replay harness."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gridmix_replay import parse_rumen, replay  # noqa: E402


def _rumen_jobs():
    return [
        {"jobID": "job_201008_0003", "jobName": "wordcount",
         "submitTime": 3000, "totalMaps": 4, "totalReduces": 1,
         "mapTasks": [], "reduceTasks": []},
        {"jobID": "job_201008_0001", "jobName": "some-user-job",
         "submitTime": 1000,
         "mapTasks": [{"taskID": "t0"}, {"taskID": "t1"}],
         "reduceTasks": [{"taskID": "r0"}]},
        {"jobID": "job_201008_0002", "jobName": "grep",
         "submitTime": 2000, "totalMaps": 2, "totalReduces": 0},
        {"notAJob": True},
    ]


def test_parse_rumen_jsonlines_and_array(tmp_path):
    jobs = _rumen_jobs()
    p1 = tmp_path / "trace.jsonl"
    p1.write_text("\n".join(json.dumps(j) for j in jobs) + "\nnot json\n")
    p2 = tmp_path / "trace.json"
    p2.write_text(json.dumps(jobs))
    for p in (p1, p2):
        entries = parse_rumen(str(p))
        # submitTime order; the non-job object and junk line are skipped
        assert [e["job_id"] for e in entries] == [
            "job_201008_0001", "job_201008_0002", "job_201008_0003"]
        # registered jobNames map straight through
        assert entries[1]["query"] == "grep"
        assert entries[2]["query"] == "wordcount"
        # unknown jobName falls back deterministically into the headline mix
        from bench import HEADLINE
        assert entries[0]["query"] in HEADLINE
        assert entries[0]["query"] == parse_rumen(str(p))[0]["query"]
        # task counts survive (mapTasks list preferred over totalMaps)
        assert entries[0]["n_maps"] == 2 and entries[0]["n_reduces"] == 1
        assert entries[2]["n_maps"] == 4


def test_replay_smoke_over_rumen_trace(spark, sf_dir, tmp_path):
    p = tmp_path / "trace.jsonl"
    p.write_text(json.dumps(
        {"jobID": "job_1", "jobName": "wordcount", "submitTime": 1}))
    results = replay(spark, parse_rumen(str(p)), sf_dir)
    assert len(results) == 1
    assert results[0]["query"] == "wordcount"
    assert results[0]["sec"] >= 0 and results[0]["job_id"] == "job_1"


def test_sls_policy_report_over_rumen_trace(spark, tmp_path):
    """--policy: the SLS scheduler replay consumes the parsed rumen
    trace (queue/submitTime/duration) and reports per-queue FIFO
    stats; capacity:2 never finishes later than fifo."""
    import json as _json

    from gridmix_replay import policy_report
    jobs = [{"jobID": f"job_{i}", "jobName": "wordcount",
             "submitTime": 1000 * i, "launchTime": 1000 * i,
             "finishTime": 1000 * i + 5000,
             "queue": ["default", "prod"][i % 2]} for i in range(8)]
    p = tmp_path / "trace.json"
    p.write_text("\n".join(_json.dumps(j) for j in jobs))
    entries = parse_rumen(str(p))
    assert all(e["queue"] in ("default", "prod") and e["dur_s"] == 5
               for e in entries)
    fifo = {q["queue"]: q for q in policy_report(spark, entries, "fifo")}
    cap = {q["queue"]: q for q in policy_report(spark, entries, "capacity:2")}
    assert set(fifo) == {"default", "prod"}
    for q in fifo:
        assert fifo[q]["n_jobs"] == 4
        assert cap[q]["tot_wait_s"] <= fifo[q]["tot_wait_s"]
        assert cap[q]["makespan_s"] <= fifo[q]["makespan_s"]
