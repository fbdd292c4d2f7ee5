#!/usr/bin/env python
"""Measure the embedding-exchange wire bytes of the sharded train step by
summing collective-op output sizes in the optimized HLO, dense vs dedup.

The dedup exchange (parallel/sharded.py, DESIGN.md §9) ships only
min(B_local, n_rows) unique rows per table; this script shows the resulting
collective-byte reduction is real in the COMPILED program, not just in the
wire-format arithmetic.  Runs on a virtual CPU mesh (no TPU needed):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/exchange_bytes.py
"""

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
               "collective-permute")
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s64": 8,
               "u64": 8, "s8": 1, "u8": 1, "pred": 1, "f64": 8}


def hlo_collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of collective ops in optimized HLO, by op kind.

    Handles TUPLE-shaped collectives — `%x = (f32[64]{0}, f32[13,64]{1,0},
    /*index=5*/f32[187,64]{1,0}, ...) all-reduce(...)` — by summing EVERY
    element shape on the line (the round-4 version matched only the first
    element and failed entirely on tuples with >=6 elements, whose
    `/*index=5*/` comments broke its `[^=]*?` bridge: butterfly-mode
    all-to-alls were counted as zero).  Async `-start` forms count once;
    `-done` re-lists the shape and is skipped by construction (the kind
    must be followed directly by `(` or `-start(`).
    """
    out = {}
    line_pat = re.compile(r"=\s*(.*?)\s(" + "|".join(COLLECTIVES) +
                          r")(?:-start)?\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = line_pat.search(line)
        if not m:
            continue
        kind = m.group(2)
        for dtype, shape in shape_pat.findall(m.group(1)):
            if dtype not in DTYPE_BYTES:
                continue
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            out[kind] = out.get(kind, 0) + n * DTYPE_BYTES[dtype]
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def compile_point(table_sizes, per_device_batch, n_data, n_model, dedup):
    import jax
    import numpy as np
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.parallel.mesh import make_mesh
    from evstore_tpu.parallel.sharded import (make_sharded_train_step,
                                              shard_dlrm_params)
    from evstore_tpu.train.train_loop import init_opt_state

    mesh = make_mesh(n_data, n_model,
                     devices=jax.devices()[:n_data * n_model])
    cfg = make_dlrm_config(16, tuple(table_sizes), (64,), (64,),
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
    dense = np.asarray(rng.random((B, 13)), np.float32)
    idx = np.asarray(np.stack([rng.integers(0, s, B)
                               for s in table_sizes], 1), np.int32)
    y = np.asarray(rng.integers(0, 2, B), np.float32)
    lowered = step.lower(params, opt, dense, idx, y) \
        if hasattr(step, "lower") else None
    if lowered is None:
        import jax
        lowered = jax.jit(step).lower(params, opt, dense, idx, y)
    hlo = lowered.compile().as_text()
    return hlo_collective_bytes(hlo)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    n_dev = len(jax.devices())
    if n_dev < 8:
        print("need XLA_FLAGS=--xla_force_host_platform_device_count=8",
              file=sys.stderr)
        sys.exit(1)

    CASES = {
        # Criteo-Kaggle-like skew: most tables far smaller than the batch
        "kaggle-skew": [3, 4, 10, 27, 105, 305, 583, 633,
                        1460, 2173, 3194, 5652, 12517, 14992,
                        26000, 100_000, 400_000, 1_000_000],
        # uniform big tables: unique bound = B_local, dedup is a no-op
        "uniform-big": [1_000_000] * 8,
    }
    print(f"{'case':<14} {'B/dev':>6} {'mode':>6} {'exchange MB/step':>17} "
          f"{'vs dense':>9}")
    for name, sizes in CASES.items():
        for pdb in (1024, 8192):
            dense_b = compile_point(sizes, pdb, n_data=2, n_model=4,
                                    dedup=False)
            dedup_b = compile_point(sizes, pdb, n_data=2, n_model=4,
                                    dedup=True)
            for mode, b in (("dense", dense_b), ("dedup", dedup_b)):
                ratio = b["total"] / max(dense_b["total"], 1)
                print(f"{name:<14} {pdb:>6} {mode:>6} "
                      f"{b['total'] / 1e6:>17.2f} {ratio:>8.2f}x")


if __name__ == "__main__":
    main()
