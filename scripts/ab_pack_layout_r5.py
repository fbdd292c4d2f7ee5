#!/usr/bin/env python
"""Round-5: kill the packed-table entry/exit relayout copies.

The step program computes on f32[500000,74] in HLO layout {1,0}
(row-major) but pack_tables hands it arrays whose device layout is
{0,1} (the pack program's reshape output) -> XLA inserts a 1.43 ms copy
PER TABLE at program entry (and mirrors at exit for donation).  The
unrolled bench amortizes them over n steps; the production per-call
train loop pays all of them every step.

Measure: per-CALL step time with (A) pack_tables as-is vs (B) the packed
arrays re-laid to row-major via jax.experimental.layout, plus the count
of [500000,74] copies in each compiled program.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_sync

jax.config.update("jax_compilation_cache_dir",
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                  + "/.jax_cache")


def main():
    from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.optim import make_pack_spec, pack_tables
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step

    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16")
    B = 65536
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1,
                       optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    spec = make_pack_spec(params, tcfg.optimizer)
    opt = init_opt_state(params, tcfg)
    params, opt = pack_tables(params, opt, spec)
    for name in spec:
        arr = params.sparse[name]["kind_plain"]
        print(name, "layout:", arr.format.layout)
        break

    step = make_train_step(cfg, tcfg, pack=spec)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, 13)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B), jnp.float32)

    def count_copies(p, o):
        txt = jax.jit(step).lower(p, o, dense, idx, y).compile().as_text()
        return len(re.findall(r"copy[^(]*\(%param[^)]*\)",
                              "\n".join(l for l in txt.splitlines()
                                        if "500000,74" in l and "copy" in l)))

    def percall(p, o, n=12):
        p, o, l = step(p, o, dense, idx, y)
        device_sync(l)
        outs = []
        for reps in (5, 5 + n):
            t0 = time.perf_counter()
            for _ in range(reps):
                p, o, l = step(p, o, dense, idx, y)
            device_sync(l)
            outs.append(time.perf_counter() - t0)
        return (outs[1] - outs[0]) / n * 1e3, p, o

    print("A entry copies:", count_copies(params, opt))
    ms_a, params, opt = percall(params, opt)
    print(f"A per-call step: {ms_a:.2f} ms")

    # B: re-lay the packed arrays row-major
    from jax.experimental.layout import Format, Layout
    rowmajor = Format(Layout(major_to_minor=(0, 1)),
                      jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    sparse = dict(params.sparse)
    for name in spec:
        arr = sparse[name]["kind_plain"]
        sparse[name] = {"kind_plain": jax.device_put(arr, rowmajor)}
    params_b = params._replace(sparse=sparse)
    for name in spec:
        print(name, "layout now:", params_b.sparse[name]["kind_plain"]
              .format.layout)
        break
    print("B entry copies:", count_copies(params_b, opt))
    ms_b, _, _ = percall(params_b, opt)
    print(f"B per-call step: {ms_b:.2f} ms")


if __name__ == "__main__":
    main()
