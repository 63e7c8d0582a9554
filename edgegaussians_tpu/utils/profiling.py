"""Profiling and throughput instrumentation.

The reference's only instrumentation is a wall-clock around training
(train_gaussians.py:321,338-341 -> time.txt). Here: a device-synchronized
timer, per-step throughput counters (px/s, renders/s, tiles/s — the
BASELINE.md metrics), and a jax.profiler trace context for TensorBoard's
trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


@contextlib.contextmanager
def device_timer(result: Dict[str, float], key: str):
    """Times a block including device completion (block_until_ready on any
    jax arrays the block registers via result['__sync__'])."""
    t0 = time.perf_counter()
    yield
    (jax.device_put(0) + 0).block_until_ready()   # drain the dispatch queue
    result[key] = result.get(key, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view in TensorBoard's trace viewer."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Accumulates renders and pixels; reports px/s and renders/s."""
    pixels_per_render: int
    tiles_per_render: int = 0
    renders: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def tick(self, n_renders: int = 1):
        self.renders += n_renders

    def report(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "renders_per_s": self.renders / dt,
            "px_per_s": self.renders * self.pixels_per_render / dt,
            "tiles_per_s": self.renders * self.tiles_per_render / dt,
            "elapsed_s": dt,
        }

    def reset(self):
        self.renders = 0
        self._t0 = time.perf_counter()
