"""True batch-size-1 per-request latency CDF capture.

Reference methodology: dlrm_s_pytorch_C1.py:938-965 timestamps every
request at bs=1 through the tiered cache and writes a downsampled CDF
(calculate_and_write_cdf:299-330).  Round 1 approximated per-request times
by dividing batch time; this run measures REAL single-request latencies
through the native tier engine (host path — the tier the reference times;
the device hop on this environment is dominated by the ~25 ms test-tunnel
roundtrip, which a production PCIe/ICI-attached host does not have).

Writes logs/cdf_bs1.csv (cumulative_prob, latency_s rows, the plot_cdf.py
input format) plus a percentile summary to stdout.

Usage: python scripts/capture_bs1_cdf.py [n_requests]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evstore_tpu.config import CacheConfig, kaggle_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
from evstore_tpu.native import NativeTieredCache
from evstore_tpu.utils.trace import LatencyRecorder


def main(n_requests: int = 30_000) -> str:
    base = kaggle_dlrm_config()
    sizes = [min(s, 1_000_000) for s in base.table_sizes]
    dim = 36
    rng = np.random.default_rng(0)
    tables = [np.asarray(rng.uniform(-1, 1, (s, dim)), np.float32)
              for s in sizes]
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=2, total_size=64_000,
                       main_precision=8, secondary_precision=4)
    nc = NativeTieredCache(ccfg, len(sizes), dim)
    nc.borrow_tables(tables)

    dcfg = RandomDataConfig(num_dense=1, table_sizes=sizes, batch_size=1,
                            num_batches=n_requests, seed=9,
                            distribution="zipf", zipf_alpha=1.05)
    # warm-up pass (reference :2226-2242) — separate stream, not timed
    warm = RandomDataConfig(num_dense=1, table_sizes=sizes, batch_size=256,
                            num_batches=40, seed=8, distribution="zipf",
                            zipf_alpha=1.05)
    for _, idx, _ in random_batches(warm):
        nc.request_batch(idx)

    lat = LatencyRecorder()
    for _, idx, _ in random_batches(dcfg):       # bs=1: one request per call
        t0 = time.perf_counter()
        nc.request_batch(idx)
        lat.record(time.perf_counter() - t0)
    st = nc.stats()
    nc.close()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "logs", "cdf_bs1.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lat.write_cdf(out)
    arr = np.asarray(lat.samples)
    print(f"bs=1 x {n_requests} requests, engine stats {st['c1']}")
    for q in (50, 90, 99, 99.9):
        print(f"  p{q}: {np.percentile(arr, q) * 1e6:.1f} us")
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30_000)
