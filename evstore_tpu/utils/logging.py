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
        payload = {
            "namespace": self.benchmark,
            "time_ms": int(time.time() * 1000),
            "event_type": "POINT_IN_TIME",
            "key": key,
            "value": value,
            "metadata": metadata or {},
        }
        self.log_fn(":::MLLOG " + json.dumps(payload, default=float))

    def submission_metadata(self, platform: str = "tpu-v5e") -> None:
        """Submission block (mlperf_logger.py:80-118)."""
        for k, v in {
            "submission_benchmark": self.benchmark,
            "submission_division": "closed",
            "submission_status": "onprem",
            "submission_platform": platform,
        }.items():
            self.event(k, value=v)
