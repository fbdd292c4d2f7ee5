"""Round-5 interaction A/B: per-sample batched gram (XLA einsum split form)
vs the sample-blocked fused Pallas kernel (ops/pallas_interaction.py
dot_interaction_blocked).

Motivating microbench (v5e, B=65536, T=26, D=36, bf16):
  read [B,T,D]                    0.17 ms   (layout padding is NOT the issue)
  per-sample gram einsum fwd      0.58 ms   (5.5 TF/s: 27x36 tile padding)
  G=4 blocked gram einsum fwd     0.081 ms  (158 TF/s, output fused away)

Isolated timings here use the bench.py fence+slope methodology with
carry-perturbed scan bodies and full-output reductions (no DCE/hoisting).
The in-step A/B lives in the train bench (bench.py) via
DLRMConfig.use_pallas_interaction.

Usage: python scripts/ab_gram_r5.py [--batch 65536]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import device_sync


def slope_time(run_n, n_lo, n_hi, reps=3):
    run_n(n_lo)
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--group", type=int, default=4)
    args = ap.parse_args()
    B, T, D = args.batch, 26, 36

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    from evstore_tpu.ops.interaction import dot_interaction
    from evstore_tpu.ops.pallas_interaction import dot_interaction_blocked

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D)), dt)
    ly = jnp.asarray(rng.standard_normal((B, T, D)), dt)

    out = {}

    def fwdbwd_case(name, fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(x, ly, n):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)

                def loss(x_, ly_):
                    return jnp.sum(fn(x_, ly_).astype(jnp.float32) ** 2)

                l, (dx, dly) = jax.value_and_grad(loss, argnums=(0, 1))(xi, ly)
                return acc + l * 1e-20 + jnp.sum(dx.astype(jnp.float32)) * 1e-20 \
                    + jnp.sum(dly.astype(jnp.float32)) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        ms = slope_time(lambda n: device_sync(run(x, ly, n)), 5, 20) * 1e3
        out[name] = ms
        print(f"{name:32s} {ms:7.3f} ms", flush=True)

    def fwd_case(name, fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(x, ly, n):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                o = fn(xi, ly)
                return acc + jnp.sum(o.astype(jnp.float32)) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        ms = slope_time(lambda n: device_sync(run(x, ly, n)), 5, 20) * 1e3
        out[name] = ms
        print(f"{name:32s} {ms:7.3f} ms", flush=True)

    blocked = functools.partial(dot_interaction_blocked,
                                self_interaction=False, tile_b=args.tile,
                                group=args.group)
    # numeric parity on-device first
    ref = dot_interaction(x, ly)
    got = blocked(x, ly)
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))
    print(f"on-device fwd max|diff| = {diff:.3e}")
    out["fwd_max_diff"] = diff

    fwd_case("xla_split_fwd", dot_interaction)
    fwd_case("pallas_blocked_fwd", blocked)
    fwdbwd_case("xla_split_fwdbwd", dot_interaction)
    fwdbwd_case("pallas_blocked_fwdbwd", blocked)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
