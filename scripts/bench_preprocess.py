"""Parallel vs sequential streaming-preprocessing throughput (VERDICT r2
item 8; ≙ data_utils.py:876 dataset_multiprocessing).  Synthetic Criteo
TSV, rows/s for num_workers in {0, 2, 4, 8}; outputs golden-checked
identical.  CPU-only — safe to run alongside chip work.

Usage: python scripts/bench_preprocess.py [n_rows]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from evstore_tpu.data.criteo import (RECORD_INTS, make_synthetic_criteo_txt,
                                     preprocess_criteo_streaming)


def main(n=2_000_000):
    with tempfile.TemporaryDirectory() as d:
        txt = make_synthetic_criteo_txt(os.path.join(d, "train.txt"), n=n,
                                        seed=0, vocab=200_000)
        mb = os.path.getsize(txt) / 1e6
        print(f"input: {n:,} rows, {mb:.0f} MB")
        out = {}
        ref = None
        for w in (0, 2, 4, 8):
            t0 = time.perf_counter()
            meta = preprocess_criteo_streaming(
                txt, os.path.join(d, f"w{w}"), days=7, chunk_rows=250_000,
                num_workers=w)
            dt = time.perf_counter() - t0
            rec = np.fromfile(str(np.load(meta)["bin_path"]),
                              np.int32).reshape(-1, RECORD_INTS)
            if ref is None:
                ref = rec
            else:
                assert np.array_equal(ref, rec), f"w={w} output differs!"
            out[f"workers_{w}"] = {"rows_per_s": n / dt, "seconds": dt}
            print(f"  workers={w}: {n/dt:,.0f} rows/s ({dt:.1f}s)")
        out["speedup_8x"] = out["workers_8"]["rows_per_s"] / \
            out["workers_0"]["rows_per_s"]
        print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
