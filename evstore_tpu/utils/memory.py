"""Memory introspection and ballast.

Reference: check_available_mem shells out to `free -h`
(dlrm_s_pytorch_C1.py:278-297) and the lock-gpu variant allocates an
"extra-mem-load" ballast tensor to constrain usable memory for storage
experiments (dlrm_s_pytorch_lock_gpu_C1.py:1819-1829).  TPU-native: host RAM
via /proc/meminfo, device HBM via jax's memory_stats; ballast as a live
device buffer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def host_memory() -> Dict[str, int]:
    """Available/total host RAM in bytes (≙ check_available_mem)."""
    out = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            if k in ("MemTotal", "MemAvailable", "MemFree"):
                out[k] = int(v.strip().split()[0]) * 1024
    return out


def device_memory(device=None) -> Dict[str, int]:
    """HBM stats for a device (bytes); empty dict if the backend doesn't
    report them."""
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {k: int(v) for k, v in stats.items()
            if k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use")}


class HBMBallast:
    """Holds `mb` megabytes of HBM hostage (≙ --extra-mem-load)."""

    def __init__(self, mb: int, device=None):
        self.mb = mb
        self._buf = None
        if mb > 0:
            n = mb * 1024 * 1024 // 4
            self._buf = jax.device_put(
                jnp.ones((n,), jnp.float32),
                device or jax.devices()[0])
            self._buf.block_until_ready()

    def release(self):
        self._buf = None
