"""Profiling & tracing utilities.

The reference has no tracing at all -- only wall-clock prints
(trainer.py:291-292,336-353).  Here: jax.profiler device traces viewable in
TensorBoard/Perfetto, named trace annotations that show up on the TPU
timeline, and a lightweight host-side phase timer for pipeline stages.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | None = None, name: str | None = None):
    """Capture a device trace for the enclosed block.

    With `log_dir`: starts/stops a full jax.profiler trace (open in
    TensorBoard).  Without: just a named TraceAnnotation so jitted steps in
    the block are labelled on any enclosing trace.
    """
    if log_dir is not None:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        with jax.profiler.TraceAnnotation(name or "aspire_block"):
            yield


class PhaseTimer:
    """Accumulating named phase timer.

    with timer("encode"): ...  -> timer.summary() dict of seconds/counts.
    Remember jitted calls are async: block_until_ready inside the phase if
    you want device time, not dispatch time.
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] += dt
            self.counts[phase] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 6), "count": self.counts[k],
                    "mean_s": round(v / max(1, self.counts[k]), 6)}
                for k, v in self.totals.items()}

    def log_summary(self):
        for k, v in self.summary().items():
            log.info("phase %-20s total %.3fs  n=%d  mean %.4fs",
                     k, v["total_s"], v["count"], v["mean_s"])
