"""Event profiling: timers + flamegraph export.

Reference: PETSc event logging (PETSc.Log.Event decorators everywhere,
SURVEY §5.1; flame graphs via -log_view ascii_flamegraph,
docs/source/optimising.rst:27-80).  Here: a process-local event tree with
wall-time + call counts + optional flop counts, a context-manager /
decorator API, and a collapsed-stack exporter consumable by standard
flamegraph tooling; jax.profiler hooks for device-side traces."""
from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager
from functools import wraps

_events = defaultdict(lambda: dict(time=0.0, count=0, flops=0.0))
_stack = []


@contextmanager
def timed_region(name: str, flops: float = 0.0):
    """Reference: pyop2/profiling.py:51 timed_region."""
    _stack.append(name)
    key = ";".join(_stack)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        ev = _events[key]
        ev["time"] += dt
        ev["count"] += 1
        ev["flops"] += flops
        _stack.pop()


def timed_function(name=None):
    """Reference: pyop2/profiling.py timed_function decorator."""
    def deco(fn):
        label = name or fn.__qualname__

        @wraps(fn)
        def wrapper(*args, **kwargs):
            with timed_region(label):
                return fn(*args, **kwargs)

        return wrapper
    return deco


def event_summary():
    """{stack path: {time, count, flops}} snapshot."""
    return {k: dict(v) for k, v in _events.items()}


def print_event_summary(min_time=0.0):
    rows = sorted(_events.items(), key=lambda kv: -kv[1]["time"])
    print(f"{'event':50s} {'count':>8s} {'time(s)':>10s} {'Mflop/s':>10s}")
    for k, v in rows:
        if v["time"] < min_time:
            continue
        mf = v["flops"] / v["time"] / 1e6 if v["time"] > 0 else 0.0
        print(f"{k:50.50s} {v['count']:8d} {v['time']:10.4f} {mf:10.1f}")


def write_flamegraph(path: str):
    """Collapsed-stack format: `a;b;c <microseconds>` per line — feed to
    flamegraph.pl / speedscope (reference parity: PETSc
    ascii_flamegraph)."""
    with open(path, "w") as fh:
        for k, v in _events.items():
            fh.write(f"{k} {int(v['time'] * 1e6)}\n")


def reset_events():
    _events.clear()


@contextmanager
def device_trace(logdir: str):
    """jax profiler trace (view in TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
