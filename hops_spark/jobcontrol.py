"""JobControl DAG parity (SURVEY §2.9; reference
hadoop-mapreduce-client-core/.../mapreduce/lib/jobcontrol/JobControl.java
and ControlledJob.java — state machine re-expressed, not ported).

The reference runs a DAG of dependent MapReduce jobs: each
ControlledJob is WAITING until its dependencies SUCCESS, then runs;
a failed job fails, and every transitive dependent becomes
DEPENDENT_FAILED without running. Inside one Spark app most "job
chains" should be ONE Catalyst plan (narrow chains fuse for free —
that is the engine's whole point), so this runner exists for the cases
that genuinely need materialization boundaries between steps:
checkpointed iterations, side-effecting sinks, steps feeding multiple
later consumers.

Steps receive the dict of their dependencies' results and return any
value (commonly a DataFrame the step has already materialized or
written). Execution order is deterministic: among runnable steps,
registration order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class State(str, Enum):
    WAITING = "WAITING"
    RUNNING = "RUNNING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class ControlledStep:
    name: str
    fn: Callable[[dict], object]
    deps: tuple[str, ...] = ()
    state: State = State.WAITING
    result: object = None
    error: BaseException | None = None


@dataclass
class JobControl:
    """Dependency-ordered runner with the reference's failure
    semantics. ``add_step`` wires the DAG; ``run`` executes it and
    returns {name: state}."""

    steps: dict[str, ControlledStep] = field(default_factory=dict)

    def add_step(self, name: str, fn: Callable[[dict], object],
                 deps: tuple[str, ...] | list[str] = ()) -> None:
        if name in self.steps:
            raise ValueError(f"duplicate step: {name}")
        unknown = [d for d in deps if d not in self.steps]
        if unknown:
            raise ValueError(f"step {name} depends on unknown steps {unknown}")
        self.steps[name] = ControlledStep(name=name, fn=fn, deps=tuple(deps))

    def _propagate_failure(self) -> None:
        changed = True
        while changed:
            changed = False
            for s in self.steps.values():
                if s.state is State.WAITING and any(
                        self.steps[d].state in (State.FAILED,
                                                State.DEPENDENT_FAILED)
                        for d in s.deps):
                    s.state = State.DEPENDENT_FAILED
                    changed = True

    def run(self) -> dict[str, str]:
        remaining = True
        while remaining:
            remaining = False
            progressed = False
            for s in self.steps.values():        # registration order
                if s.state is not State.WAITING:
                    continue
                remaining = True
                if all(self.steps[d].state is State.SUCCESS for d in s.deps):
                    s.state = State.RUNNING
                    try:
                        s.result = s.fn(
                            {d: self.steps[d].result for d in s.deps})
                        s.state = State.SUCCESS
                    except Exception as exc:       # noqa: BLE001 — step isolation
                        s.state = State.FAILED
                        s.error = exc
                        self._propagate_failure()
                    progressed = True
            if remaining and not progressed:
                stuck = [s.name for s in self.steps.values()
                         if s.state is State.WAITING]
                raise RuntimeError(f"dependency cycle among {stuck}")
        return {n: s.state.value for n, s in self.steps.items()}

    def results(self) -> dict[str, object]:
        return {n: s.result for n, s in self.steps.items()
                if s.state is State.SUCCESS}
