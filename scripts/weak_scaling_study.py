#!/usr/bin/env python
"""Weak-scaling study (round 5): the per-device exchange-byte growth law
for the sharded train step, 1 -> 8 devices, psum vs butterfly, dense vs
dedup, from the COMPILED HLO — plus the wall-clock sweep as harness
validation.

Why bytes, not seconds: the only scaling evidence this environment can
produce runs on virtual CPU devices that share 2 physical cores, so
wall-clock "efficiency" measures host contention, not the program.  What
the compiled program SHIPS per device per step is exact, environment-
independent, and — combined with the ICI bandwidth of a real slice — is
the standard model for projected scaling (collectives ride ICI; a
weak-scaling sweep is ~bandwidth-bound when per-device bytes stay flat).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/weak_scaling_study.py [--timing] [--out FILE]

Reference counterpart: extend_distributed.py:389-486 (NCCL all_to_all)
whose wire bytes grow with GLOBAL batch per device; BASELINE.md north
star is >=80% weak-scaling efficiency.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exchange_bytes import hlo_collective_bytes  # noqa: E402

TABLE_SIZES = [3, 4, 10, 27, 105, 305, 583, 633, 1460, 2173, 3194, 5652,
               12517, 14992, 26000, 100_000, 400_000, 1_000_000]
PER_DEVICE_BATCH = 2048


def compile_sharded(n_devices, dedup):
    import jax
    import numpy as np
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.parallel.mesh import make_mesh
    from evstore_tpu.parallel.sharded import (make_sharded_train_step,
                                              shard_dlrm_params)
    from evstore_tpu.train.train_loop import init_opt_state

    n_model = min(2, n_devices)
    n_data = n_devices // n_model
    mesh = make_mesh(n_data, n_model, devices=jax.devices()[:n_devices])
    cfg = make_dlrm_config(16, tuple(TABLE_SIZES), (64,), (64,),
                           num_dense=13)
    B = PER_DEVICE_BATCH * n_data
    tcfg = TrainConfig(batch_size=B, optimizer="rwsadagrad",
                       learning_rate=0.1)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params, tcfg)
    params, opt, _, _ = shard_dlrm_params(params, mesh, opt)
    step = make_sharded_train_step(cfg, tcfg, mesh, B, dedup_exchange=dedup)(
        params, opt)
    rng = np.random.default_rng(0)
    dense = np.asarray(rng.random((B, 13)), np.float32)
    idx = np.stack([rng.integers(0, s, B) for s in TABLE_SIZES],
                   1).astype(np.int32)
    y = rng.integers(0, 2, B).astype(np.float32)
    hlo = step.lower(params, opt, dense, idx, y).compile().as_text()
    return hlo_collective_bytes(hlo)


def compile_butterfly(n_devices, dedup):
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.parallel.butterfly import (AXIS, init_butterfly_state,
                                                make_butterfly_train_step)
    from evstore_tpu.parallel.planner import plan_table_shards

    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), (AXIS,))
    cfg = make_dlrm_config(16, tuple(TABLE_SIZES), (64,), (64,),
                           num_dense=13)
    B = PER_DEVICE_BATCH * n_devices
    tcfg = TrainConfig(batch_size=B, optimizer="rwsadagrad",
                       learning_rate=0.1)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    order, _ = plan_table_shards(cfg.table_sizes, n_devices)
    state = list(init_butterfly_state(params, tcfg, mesh, table_order=order))
    step = make_butterfly_train_step(cfg, tcfg, mesh, B, dedup_exchange=dedup,
                                     table_order=order)(*state)
    rng = np.random.default_rng(0)
    dense = np.asarray(rng.random((B, 13)), np.float32)
    idx = np.stack([rng.integers(0, s, B) for s in TABLE_SIZES],
                   1).astype(np.int32)
    y = rng.integers(0, 2, B).astype(np.float32)
    k = np.zeros((), np.int32)
    hlo = step.lower(*state, k, dense, idx, y).compile().as_text()
    return hlo_collective_bytes(hlo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timing", action="store_true",
                    help="also run the wall-clock sweep (harness validation; "
                         "virtual devices share the host cores)")
    ap.add_argument("--out", default="logs/weak_scaling_r5.json")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        print("need XLA_FLAGS=--xla_force_host_platform_device_count=8",
              file=sys.stderr)
        sys.exit(1)

    result = {"per_device_batch": PER_DEVICE_BATCH,
              "table_sizes": TABLE_SIZES, "points": []}
    print(f"{'impl':<10} {'dedup':>5} {'N':>2} {'total MB':>9} "
          f"{'MB/device':>10} {'vs N=1/dev':>10}")
    for impl, compile_fn in (("psum", compile_sharded),
                             ("butterfly", compile_butterfly)):
        for dedup in (False, True):
            base_per_dev = None
            for n in (1, 2, 4, 8):
                b = compile_fn(n, dedup)
                per_dev = b["total"] / max(n, 1)
                if base_per_dev is None:
                    # N=1 compiles away all collectives; use N=2 as the base
                    base_per_dev = None if b["total"] == 0 else per_dev
                ratio = (per_dev / base_per_dev) if base_per_dev else 0.0
                if base_per_dev is None and b["total"] > 0:
                    base_per_dev = per_dev
                    ratio = 1.0
                point = {"impl": impl, "dedup": dedup, "devices": n,
                         "total_bytes": b["total"],
                         "bytes_per_device": per_dev,
                         "by_kind": {k: v for k, v in b.items()
                                     if k != "total"}}
                result["points"].append(point)
                print(f"{impl:<10} {str(dedup):>5} {n:>2} "
                      f"{b['total'] / 1e6:>9.2f} {per_dev / 1e6:>10.2f} "
                      f"{ratio:>9.2f}x")

    if args.timing:
        from weak_scaling import run_point, run_point_butterfly
        result["timing"] = []
        for impl in ("psum", "butterfly"):
            for n in (1, 2, 4, 8):
                if impl == "psum":
                    eps = run_point(n, 256, 2, steps=15)
                else:
                    eps = run_point_butterfly(n, 256, steps=15)
                result["timing"].append(
                    {"impl": impl, "devices": n, "examples_per_s": eps,
                     "per_device": eps / n})
                print(json.dumps(result["timing"][-1]), flush=True)
        result["timing_note"] = ("virtual devices share 2 physical host "
                                 "cores; timing validates the harness, not "
                                 "scaling efficiency")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
