"""Profiling / tracing hooks.

The reference's profiling is a commented-out fvcore FLOP counter and
torch.cuda timers (main_linprobe.py:582-608, util/misc.py:121-165). Here:
  * ``trace`` — context manager around jax.profiler (XLA trace viewer),
    enabled by --profile_dir;
  * ``compiled_cost`` — XLA's own FLOP/bytes estimate of a jitted fn
    (replaces fvcore);
  * ``ThroughputMeter`` — step-time/images-per-second meter used by bench.py
    and the engine logs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args) -> dict:
    """FLOPs / bytes-accessed estimate from the compiled executable."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }


class ThroughputMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int):
        self._images += n_images

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else 0.0
