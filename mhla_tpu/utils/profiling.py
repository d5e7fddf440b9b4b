"""Tracing & profiling utilities.

TPU equivalents of the reference's instrumentation (SURVEY.md section 5):
phase timers (``train_wan.py:459-463`` data/vae/lm/model timers,
``misc.py:143`` SimpleTimer), and jax.profiler trace capture in place of
Triton autotune logs. Model-internal capture (the reference's attention /
block hooks) is flax ``sow`` — see ``WanBlock`` intermediates.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulating per-phase wall-clock timers.

    >>> timer = PhaseTimer()
    >>> with timer.phase("data"): batch = next(loader)
    >>> with timer.phase("step"): state, _ = step(state, batch)
    >>> timer.summary()  # {'data': ..., 'step': ...}
    """

    def __init__(self, sync: bool = False):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if self.sync:
            # drain the device queue so the phase owns its device time
            jax.effects_barrier()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self, reset: bool = False) -> Dict[str, float]:
        out = {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out


class SimpleTimer:
    """Lap timer (reference ``misc.py:143``)."""

    def __init__(self):
        self.start = time.perf_counter()
        self.last = self.start

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt

    def total(self) -> float:
        return time.perf_counter() - self.start


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard) around a
    code region; no-op when ``log_dir`` is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (when the backend reports it)."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d.id)] = stats.get("bytes_in_use", 0) / 2**30
    return out
