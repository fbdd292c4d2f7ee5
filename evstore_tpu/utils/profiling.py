"""Profiling helpers.

Reference: torch.autograd.profiler around the main loop with
record_function spans and a Chrome trace export (dlrm_s_pytorch.py:132,
1567-1569,1880-1890).  TPU-native: jax.profiler produces the same artifact
class (TensorBoard/perfetto trace); spans map to TraceAnnotation.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a device trace for everything inside the block
    (≙ --enable-profiling)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def span(name: str):
    """Named span visible in the trace (≙ record_function)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with device sync (≙ time_wrap's cuda sync,
    dlrm_s_pytorch.py:126-129)."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.times.append(time.perf_counter() - self._t0)

    def mean_ms(self) -> float:
        import numpy as np
        return float(np.mean(self.times) * 1000) if self.times else 0.0
