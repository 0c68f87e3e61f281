"""Gridmix/SLS/Rumen parity (SURVEY.md §2.10): replay a workload trace
of inventory queries against a scale-factor directory.

The reference synthesizes and replays job mixes from traces
(hadoop-tools/hadoop-gridmix/.../Gridmix.java:59, SLSRunner.java:99,
rumen TraceBuilder.java:51). Here the trace is a JSON-lines file of
{"query": <registry name>, "repeat": N} records; each entry is executed
(noop write — full plan, no driver collect) and per-entry wall times
are reported as one JSON line.

Usage:
    python tools/gridmix_replay.py TRACE.jsonl [SF_DIR]
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


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--synth":
        trace = synthesize(int(args[1]))
        rest = args[2:]
    else:
        with open(args[0]) as f:
            trace = [json.loads(line) for line in f if line.strip()]
        rest = args[1:]
    sf_dir = rest[0] if rest else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("gridmix-replay")
    specs = load_all()
    results = []
    t_all = time.time()
    for entry in trace:
        spec = specs[entry["query"]]
        t0 = time.time()
        for _ in range(int(entry.get("repeat", 1))):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        results.append({"query": entry["query"],
                        "repeat": int(entry.get("repeat", 1)),
                        "sec": round(time.time() - t0, 3)})
    print(json.dumps({
        "metric": "gridmix_replay_seconds",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "entries": results,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
