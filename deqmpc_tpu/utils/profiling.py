"""Tracing / profiling helpers.

The reference instruments with ad-hoc `time.time()` spans
(`qpth/al_utils.py:500-556`, `train.py:355-361`). TPU-native
equivalents: `jax.profiler` traces viewable in TensorBoard/Perfetto,
and a block-until-ready phase timer for quick CLI numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase, synchronizing the device
    at phase ends so numbers mean device time (plus dispatch)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }

    def report(self) -> str:
        return "  ".join(
            f"{k}={v * 1e3:.1f}ms" for k, v in sorted(self.summary().items())
        )


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/deqmpc_trace"):
    """jax.profiler trace context (open in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
