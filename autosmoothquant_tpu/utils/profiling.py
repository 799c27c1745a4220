"""Tracing / profiling helpers (SURVEY.md §5 aux subsystems).

The reference's closest artifacts are tqdm progress + offline GEMM timing
files (calibration.py:220-228, cublasAlgoMap exec_time). Here:
  - ``phase``: wall-clock phase timers with a process-global report
  - ``device_trace``: jax.profiler trace context writing a TensorBoard
    xplane dump for kernel-level inspection
  - ``device_time``: robust device-side timing through this runtime's
    high-jitter dispatch (slope method; see bench.py)
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Callable, Dict

_PHASES: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PHASES[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def phase_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    out = {k: {"seconds": round(v, 4), "calls": _COUNTS[k]}
           for k, v in sorted(_PHASES.items())}
    if reset:
        _PHASES.clear()
        _COUNTS.clear()
    return out


def print_phase_report(reset: bool = True) -> None:
    print(json.dumps(phase_report(reset)))


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, n_lo: int = 4, n_hi: int = 104,
                reps: int = 3) -> float:
    """Per-iteration device time of ``fn(*args)`` via a chained fori_loop
    slope — immune to this runtime's 30ms-to-seconds dispatch jitter.
    ``fn`` must map its first arg to a same-shaped output."""
    import jax
    import numpy as np

    @jax.jit
    def loop(x0, n):
        return jax.lax.fori_loop(
            0, n, lambda i, x: fn(x, *args[1:]).astype(x.dtype), x0)

    x = args[0]
    np.asarray(jax.device_get(loop(x, n_lo)))
    np.asarray(jax.device_get(loop(x, n_hi)))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(x, n_lo)))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(x, n_hi)))
        b = time.perf_counter() - t0
        vals.append((b - a) / (n_hi - n_lo))
    return float(np.median(vals))
