"""One-command verification battery — the round's gates as a JobControl
DAG (dogfooding hops_spark/jobcontrol.py): window oracle replica, then
partition-count determinism and a bench smoke in dependency order, one
JSON verdict line at the end.

Usage:
    python tools/verify_all.py [sf_dir]        # default /root/testdata/sf0.01

Steps (each FAILED step marks dependents DEPENDENT_FAILED):
    oracle       — tools/check_oracle.py --window scope (the driver gate)
    queue_oracle — tools/check_oracle.py --queue scope (NEXT_WINDOW_QUEUE
                   rows — pre-verifies the next rotation's additions)
    determinism  — tools/determinism_check.py over the same window
    bench_smoke  — bench.py at the given sf_dir (full plan execution)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hops_spark.jobcontrol import JobControl

_TOOLS = os.path.dirname(os.path.abspath(__file__))


def _run(argv: list[str], env: dict | None = None) -> str:
    proc = subprocess.run(argv, capture_output=True, text=True, env=env)
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
    if proc.returncode != 0:
        raise RuntimeError(f"{argv[1] if len(argv) > 1 else argv[0]} "
                           f"rc={proc.returncode}: {tail}")
    return tail


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    py = sys.executable

    jc = JobControl()
    jc.add_step("oracle", lambda d: _run(
        [py, os.path.join(_TOOLS, "check_oracle.py"), sf_dir, "--window"]))
    jc.add_step("queue_oracle", lambda d: _run(
        [py, os.path.join(_TOOLS, "check_oracle.py"), sf_dir, "--queue"]))
    jc.add_step("determinism", lambda d: _run(
        [py, os.path.join(_TOOLS, "determinism_check.py"), sf_dir]),
        ["oracle"])
    jc.add_step("bench_smoke", lambda d: _run(
        [py, os.path.join(_TOOLS, "..", "bench.py")],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}),
        ["oracle"])
    states = jc.run()
    verdict = {
        "job": "verify_all", "sf_dir": sf_dir, "states": states,
        "ok": all(v == "SUCCESS" for v in states.values()),
        "tails": {n: str(s.result or s.error)
                  for n, s in jc.steps.items()},
    }
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
