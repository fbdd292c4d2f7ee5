#!/usr/bin/env python
"""Weak-scaling harness: examples/s at fixed per-device batch as the mesh
grows (BASELINE north star: >=80% weak-scaling efficiency).

On real hardware: run per slice size.  Without a pod, run on virtual CPU
devices to validate the harness and the SPMD program:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/weak_scaling.py --virtual --max-devices 8
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_point(n_devices: int, per_device_batch: int, n_model: int,
              steps: int = 30, dedup: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.parallel.mesh import make_mesh
    from evstore_tpu.parallel.sharded import (make_sharded_train_step,
                                              shard_dlrm_params)
    from evstore_tpu.train.train_loop import init_opt_state

    n_model = min(n_model, n_devices)
    n_data = n_devices // n_model
    mesh = make_mesh(n_data, n_model, devices=jax.devices()[:n_devices])
    cfg = make_dlrm_config(16, tuple([50_000] * 8), (64,), (64,),
                           num_dense=13)
    B = per_device_batch * n_data
    tcfg = TrainConfig(batch_size=B, optimizer="rwsadagrad",
                       learning_rate=0.1)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params, tcfg)
    params, opt, _, _ = shard_dlrm_params(params, mesh, opt)
    step = make_sharded_train_step(cfg, tcfg, mesh, B,
                                   dedup_exchange=dedup)(params, opt)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, 13)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
    # fenced + slope (bench.py:13-27): block_until_ready returns at
    # enqueue-ack on the axon tunnel, so each window ends with a real
    # device->host transfer and the slope cancels the dispatch constant
    from bench import device_sync

    def run_n(n):
        # fresh sharded buffers each window (the jit donates them); the
        # per-window init cost is constant, cancelled by the slope
        p = init_dlrm(jax.random.PRNGKey(0), cfg)
        o = init_opt_state(p, tcfg)
        p, o, _, _ = shard_dlrm_params(p, mesh, o)
        loss = None
        for _ in range(n):
            p, o, loss = step(p, o, dense, idx, y)
        device_sync(loss)

    run_n(steps // 3)   # compile + warm
    ts = {}
    for n in (steps // 3, steps):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return B / ((ts[steps] - ts[steps // 3]) / (steps - steps // 3))


def run_point_butterfly(n_devices: int, per_device_batch: int,
                        steps: int = 30, dedup: bool = False):
    """Table-wise lax.all_to_all exchange point (--alltoall-impl butterfly),
    with the LPT-planned placement."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.parallel.butterfly import (AXIS, init_butterfly_state,
                                                make_butterfly_train_step)
    from evstore_tpu.parallel.planner import plan_table_shards

    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), (AXIS,))
    cfg = make_dlrm_config(16, tuple([50_000] * 8), (64,), (64,),
                           num_dense=13)
    B = per_device_batch * n_devices
    tcfg = TrainConfig(batch_size=B, optimizer="rwsadagrad",
                       learning_rate=0.1)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    order, _ = plan_table_shards(cfg.table_sizes, n_devices)
    state = list(init_butterfly_state(params, tcfg, mesh, table_order=order))
    step = make_butterfly_train_step(cfg, tcfg, mesh, B, dedup_exchange=dedup,
                                     table_order=order)(*state)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, 13)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
    k = jnp.zeros((), jnp.int32)
    from bench import device_sync

    def run_n(n):
        # fresh stack/row_state each window (donated by the jit)
        st = list(init_butterfly_state(params, tcfg, mesh,
                                       table_order=order))
        loss = None
        for i in range(n):
            *st, loss = step(*st, k + i, dense, idx, y)
        device_sync(loss)

    run_n(steps // 3)   # compile + warm
    ts = {}
    for n in (steps // 3, steps):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return B / ((ts[steps] - ts[steps // 3]) / (steps - steps // 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", action="store_true",
                   help="force CPU backend (virtual devices)")
    p.add_argument("--max-devices", type=int, default=0)
    p.add_argument("--per-device-batch", type=int, default=256)
    p.add_argument("--n-model", type=int, default=2)
    p.add_argument("--dedup-exchange", action="store_true",
                   help="ship unique rows through the exchange")
    p.add_argument("--alltoall-impl", choices=["psum", "butterfly"],
                   default="psum")
    args = p.parse_args()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    n_avail = len(jax.devices())
    maxd = args.max_devices or n_avail
    points = []
    n = 1
    while n <= maxd:
        if args.alltoall_impl == "butterfly":
            eps = run_point_butterfly(n, args.per_device_batch,
                                      dedup=args.dedup_exchange)
        else:
            eps = run_point(n, args.per_device_batch, args.n_model,
                            dedup=args.dedup_exchange)
        points.append({"devices": n, "examples_per_s": eps,
                       "per_device": eps / n})
        print(json.dumps(points[-1]), flush=True)
        n *= 2
    if len(points) > 1:
        eff = points[-1]["per_device"] / points[0]["per_device"]
        print(json.dumps({"weak_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
