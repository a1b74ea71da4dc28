"""Profiling helpers.

The reference had no built-in tracing (SURVEY.md §5.1 — only wall-clock eval
timing and a cProfile comment). Here: a simple stage timer plus optional XLA
trace capture via jax.profiler for TensorBoard/Perfetto viewing.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulate wall time per named stage, blocking on device results."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.time()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def report(self):
        for k, v in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            print(f"{k:30s} {v['total_s']:8.3f}s  ({v['calls']} calls, {v['mean_s']*1e3:.1f} ms/call)")


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
