"""Tracing / profiling utilities (SURVEY §5 aux subsystem).

The reference measures per-sample wall time with CUDA events / ``time.time``
(simulate.py:278-331) and uses Lightning's "simple" profiler for training.
TPU-native equivalents: ``jax.profiler`` traces viewable in TensorBoard /
Perfetto, plus lightweight wall-clock scopes that block on device work.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def device_timer(name, log=None, sync=True):
    """Wall-clock a block, blocking until device work completes."""
    t0 = time.perf_counter()
    yield
    if sync:
        import jax

        # block on all live arrays the caller produced inside the scope
        jax.effects_barrier()
    dt = time.perf_counter() - t0
    if log is not None:
        log.setdefault(name, []).append(dt)


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace scope (open in TensorBoard / xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named wall-clock scopes (Lightning 'simple' profiler
    replacement; reference trainer.py:68)."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def scope(self, name):
        t0 = time.perf_counter()
        yield
        self.times[name].append(time.perf_counter() - t0)

    def summary(self):
        return {
            name: {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / max(len(vals), 1),
            }
            for name, vals in self.times.items()
        }

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)
        return path
