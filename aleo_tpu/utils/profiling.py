"""Profiling / metrics: stage timers, throughput counters, JAX traces.

The reference has no profiler or metrics export (SURVEY.md §5 — wall-clock
`performance.now()` logs in the browser worker only); this subsystem is
green-field TPU-native observability:

  * `stage(name)` — context manager accumulating wall-clock per named stage
    (the prover annotates its rounds; see snark/prover.py).
  * `counter(name, n)` — accumulate a throughput numerator (points,
    butterflies, constraints) attributed to the current stage.
  * `report()` / `reset()` — snapshot and clear.
  * `trace(dir)` — wraps `jax.profiler.trace` for XLA-level traces viewable
    in TensorBoard/XProf (set ALEO_TPU_TRACE_DIR to capture around bench).

Enabled when ALEO_TPU_PROFILE=1 (near-zero overhead when disabled: the
context manager short-circuits).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict

_enabled = os.environ.get("ALEO_TPU_PROFILE", "") not in ("", "0")
_lock = threading.Lock()
_times: Dict[str, float] = defaultdict(float)
_calls: Dict[str, int] = defaultdict(int)
_counts: Dict[str, float] = defaultdict(float)
_stack = threading.local()


def enabled() -> bool:
    return _enabled


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


@contextlib.contextmanager
def stage(name: str):
    if not _enabled:
        yield
        return
    frames = getattr(_stack, "frames", None)
    if frames is None:
        frames = _stack.frames = []
    frames.append(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        frames.pop()
        with _lock:
            _times[name] += dt
            _calls[name] += 1


def counter(name: str, n: float) -> None:
    if not _enabled:
        return
    with _lock:
        _counts[name] += n


def report() -> Dict[str, dict]:
    with _lock:
        out = {}
        for name, t in sorted(_times.items(), key=lambda kv: -kv[1]):
            out[name] = {"seconds": round(t, 4), "calls": _calls[name]}
        for name, n in _counts.items():
            key = f"count/{name}"
            out[key] = {"total": n}
            # attach rate if a same-named stage exists
            if name in _times and _times[name] > 0:
                out[key]["per_second"] = round(n / _times[name], 1)
        return out


def reset() -> None:
    with _lock:
        _times.clear()
        _calls.clear()
        _counts.clear()


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """XLA-level profiler trace (TensorBoard format)."""
    log_dir = log_dir or os.environ.get("ALEO_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
