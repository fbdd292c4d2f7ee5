"""Structured (MLPerf-style) logging.

Reference: mlperf_logger.py wraps mlperf_logging.mllog with rank-0 gating and
submission metadata (:21-118).  mlperf_logging isn't in this image, so the
logger emits the same single-line `:::MLLOG {json}` format directly; the
interface (event keys, init/run/epoch blocks) matches the call sites in
dlrm_s_pytorch.py:1077-1860.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class MLPerfLogger:
    def __init__(self, benchmark: str = "dlrm", log_fn=print,
                 enabled: bool = True, rank: int = 0):
        self.benchmark = benchmark
        self.log_fn = log_fn
        self.enabled = enabled and rank == 0   # rank-0 gating (:36-49)

    def event(self, key: str, metadata: Optional[dict] = None,
              value=None) -> None:
        if not self.enabled:
            return
        # mllog event-type inference: *_start / *_stop keys are interval
        # markers (mlperf_logging mllog constants, used by
        # mlperf_logger.py:51-77 start/end/event helpers)
        if key.endswith("_start"):
            etype = "INTERVAL_START"
        elif key.endswith("_stop"):
            etype = "INTERVAL_END"
        else:
            etype = "POINT_IN_TIME"
        payload = {
            "namespace": self.benchmark,
            "time_ms": int(time.time() * 1000),
            "event_type": etype,
            "key": key,
            "value": value,
            "metadata": metadata or {},
        }
        self.log_fn(":::MLLOG " + json.dumps(payload, default=float))

    def submission_metadata(self, platform: str = "tpu-v5e",
                            org: str = "evstore_tpu",
                            division: str = "closed",
                            status: str = "onprem") -> None:
        """Submission block (mlperf_logger.py:80-118: benchmark, org,
        division, status, platform, poc placeholders)."""
        for k, v in {
            "submission_benchmark": self.benchmark,
            "submission_org": org,
            "submission_division": division,
            "submission_status": status,
            "submission_platform": platform,
            "submission_entry": {"framework": "jax/xla",
                                 "hardware": platform},
        }.items():
            self.event(k, value=v)
