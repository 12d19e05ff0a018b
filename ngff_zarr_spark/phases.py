"""Lightweight per-phase wall-clock accounting for composite write
paths (VERDICT r10 ask #1: the plate-scale incremental HCS write is a
hundreds-of-jobs pipeline whose bench variance needed attribution to a
phase, not a guess).

Driver-side only — the accumulator is a plain module dict; executors
never import it with state. Phases nest additively: a name's total is
the sum of all its enter/exit spans in the current window.

SCOPING CONTRACT: the accumulator is PROCESS-GLOBAL, one measurement
window at a time. A lock makes concurrent updates atomic (no lost
increments), but two instrumented pipelines running at once still MERGE
into one set of totals — reset()/snapshot() delimit a window, they
don't isolate callers. That is the intended design: the only consumer
is bench.py's single-threaded phase attribution. If an instrumented
path ever needs concurrent per-caller accounting, switch the dicts to
a contextvars.ContextVar holding per-context accumulators.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

PHASE_TIMES: dict[str, float] = {}
PHASE_COUNTS: dict[str, int] = {}
_LOCK = threading.Lock()


def reset() -> None:
    with _LOCK:
        PHASE_TIMES.clear()
        PHASE_COUNTS.clear()


@contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            PHASE_TIMES[name] = PHASE_TIMES.get(name, 0.0) + dt
            PHASE_COUNTS[name] = PHASE_COUNTS.get(name, 0) + 1


def snapshot() -> dict[str, dict[str, float]]:
    """{name: {"sec": total, "n": calls}} rounded for printing."""
    return {
        k: {"sec": round(v, 3), "n": PHASE_COUNTS.get(k, 0)}
        for k, v in sorted(PHASE_TIMES.items(), key=lambda kv: -kv[1])
    }
