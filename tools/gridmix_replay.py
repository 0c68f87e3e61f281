"""Gridmix/SLS/Rumen parity (SURVEY.md §2.10): replay a workload trace
of inventory queries against a scale-factor directory.

The reference synthesizes and replays job mixes from traces
(hadoop-tools/hadoop-gridmix/.../Gridmix.java:59, SLSRunner.java:99,
rumen TraceBuilder.java:51). Two trace dialects are accepted:

- native: JSON-lines of {"query": <registry name>, "repeat": N}
- rumen: the reference's job-trace JSON (one job object per line, or
  a JSON array) with jobID/jobName/submitTime/mapTasks/... fields —
  jobs are replayed in submitTime order; a job maps to the registry
  query named by its jobName, falling back to a deterministic
  md5(jobID) draw over the bench headline mix (the gridmix synthesis
  rule) when the name is not an inventory query.

Each entry executes as a noop write (full plan, no driver collect);
per-entry wall times are reported as one JSON line.

Usage:
    python tools/gridmix_replay.py TRACE.jsonl [SF_DIR]
    python tools/gridmix_replay.py --rumen RUMEN_TRACE.json [SF_DIR]
    python tools/gridmix_replay.py --synth 20 [SF_DIR]   # synthesize a
        deterministic 20-entry mix over the bench headline queries
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hops_spark.registry import load_all
from hops_spark.session import get_spark


def synthesize(n: int) -> list[dict]:
    """Deterministic trace: md5-weighted draw over the headline mix."""
    from bench import HEADLINE
    out = []
    for i in range(n):
        h = int(hashlib.md5(f"trace|{i}".encode()).hexdigest()[:8], 16)
        out.append({"query": HEADLINE[h % len(HEADLINE)], "repeat": 1 + h % 3})
    return out


def _fallback_query(job_id: str) -> str:
    from bench import HEADLINE
    h = int(hashlib.md5(job_id.encode()).hexdigest()[:8], 16)
    return HEADLINE[h % len(HEADLINE)]


def parse_rumen(path: str, registered: set[str] | None = None) -> list[dict]:
    """Parse a rumen-shaped job trace (TraceBuilder.java:51 output: one
    JSON job object per line, or one JSON array) into replay entries.

    Per job: query = jobName if it names a registry query, else a
    deterministic md5(jobID) draw over the headline mix; repeat = 1;
    ordering = ascending submitTime (the replay clock). Unparseable
    lines and non-job objects are skipped with a count."""
    if registered is None:
        registered = set(load_all())
    with open(path) as f:
        head = f.read().lstrip()
    jobs: list[dict] = []
    if head.startswith("["):
        jobs = [j for j in json.loads(head) if isinstance(j, dict)]
    else:
        for line in head.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict):
                jobs.append(obj)
    entries = []
    for j in jobs:
        job_id = str(j.get("jobID") or j.get("jobid") or j.get("jobId") or "")
        name = str(j.get("jobName") or j.get("jobname") or "")
        if not job_id and not name:
            continue                              # not a job object
        submit_ms = int(j.get("submitTime") or 0)
        finish_ms = int(j.get("finishTime") or 0)
        launch_ms = int(j.get("launchTime") or submit_ms)
        dur_s = max(1, (finish_ms - launch_ms) // 1000) if finish_ms \
            else 1 + int(hashlib.md5((job_id or name).encode())
                         .hexdigest()[:8], 16) % 300
        entries.append({
            "query": name if name in registered else _fallback_query(job_id or name),
            "repeat": 1,
            "submit_ms": submit_ms,
            "job_id": job_id,
            "queue": str(j.get("queue") or j.get("queueName") or "default"),
            "dur_s": dur_s,
            "n_maps": len(j.get("mapTasks") or []) or int(j.get("totalMaps") or 0),
            "n_reduces": len(j.get("reduceTasks") or []) or int(j.get("totalReduces") or 0),
        })
    entries.sort(key=lambda e: (e["submit_ms"], e["job_id"]))
    return entries


def replay(spark, trace: list[dict], sf_dir: str) -> list[dict]:
    """Execute every trace entry as a noop write; returns per-entry
    wall-clock results."""
    specs = load_all()
    results = []
    for entry in trace:
        spec = specs[entry["query"]]
        t0 = time.time()
        for _ in range(int(entry.get("repeat", 1))):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rec = {"query": entry["query"],
               "repeat": int(entry.get("repeat", 1)),
               "sec": round(time.time() - t0, 3)}
        if "job_id" in entry:
            rec["job_id"] = entry["job_id"]
        results.append(rec)
    return results


def policy_report(spark, entries: list[dict], policy: str) -> list[dict]:
    """SLS scheduler-policy replay over a parsed rumen trace
    (SLSRunner.java's report surface): per-queue wait/makespan stats
    under 'fifo' (serial per queue) or 'capacity:N' (N slots per
    queue). See hops_spark/ops/sched.py."""
    from hops_spark.ops.sched import (capacity_schedule, fifo_schedule,
                                      queue_stats)
    rows = [(e["job_id"] or str(i), e["queue"], e["submit_ms"] // 1000,
             e["dur_s"]) for i, e in enumerate(entries)]
    trace = spark.createDataFrame(
        rows, "job_id string, queue string, submit_s long, dur_s long")
    if policy == "fifo":
        sched = fifo_schedule(trace)
    elif policy.startswith("capacity:"):
        sched = capacity_schedule(trace, int(policy.split(":", 1)[1]))
    else:
        raise SystemExit(f"unknown policy {policy!r} (fifo | capacity:N)")
    return [r.asDict() for r in queue_stats(sched).collect()]


def main() -> None:
    args = sys.argv[1:]
    policy = None
    if "--policy" in args:
        i = args.index("--policy")
        policy = args[i + 1]
        args = args[:i] + args[i + 2:]
    if args and args[0] == "--synth":
        trace = synthesize(int(args[1]))
        rest = args[2:]
    elif args and args[0] == "--rumen":
        trace = parse_rumen(args[1])
        rest = args[2:]
    else:
        with open(args[0]) as f:
            trace = [json.loads(line) for line in f if line.strip()]
        rest = args[1:]
    sf_dir = rest[0] if rest else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("gridmix-replay")
    if policy is not None:
        print(json.dumps({
            "metric": "sls_policy_report", "policy": policy,
            "queues": policy_report(spark, trace, policy)}))
        return
    t_all = time.time()
    results = replay(spark, trace, sf_dir)
    print(json.dumps({
        "metric": "gridmix_replay_seconds",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "entries": results,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
