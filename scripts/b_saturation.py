"""Honest (fenced+slope) train-step batch-saturation sweep — re-measures
EXPERIMENTS §11, whose pre-round-3 numbers were dispatch rates
(block_until_ready returns at enqueue-ack on this tunnel; VERDICT r2
weak #1).  Uses bench.bench_train directly: staged batches, device fence,
two-window slope.

Usage: python scripts/b_saturation.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from evstore_tpu.config import kaggle_small_dlrm_config


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16")
    out = {}
    for B in (8192, 16384, 32768, 65536):
        eps, step_ms, _ = bench.bench_train(cfg, B=B, n_lo=8, n_hi=24)
        out[f"B{B}"] = {"examples_per_s": eps, "step_ms": step_ms * 1e3}
        print(f"B={B}: {eps:,.0f} ex/s ({step_ms*1e3:.2f} ms/step)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
