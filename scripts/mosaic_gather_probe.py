"""Which vectorized gather forms does Mosaic lower inside a TPU kernel?

Tries, on a [C, D] VMEM chunk with [M] indices:
  a) jnp.take(chunk, idx, axis=0)
  b) jnp.take_along_axis(chunk, idx[:, None] broadcast to [M, D], axis=0)
  c) one-hot matmul (always works; MXU cost baseline)
  d) chunk[idx] advanced indexing
Each: compile?, correct?, ns/row (fenced+slope, M=8192 rows, C=8192).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import device_sync


def slope_time(run_n, n_lo=8, n_hi=32, reps=3):
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
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")

    rng = np.random.default_rng(0)
    C, D, M = 8192, 36, 8192
    chunk = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, M), jnp.int32)
    want = np.asarray(jnp.take(chunk, idx, axis=0))

    def bench(name, pk):
        try:
            got = np.asarray(pk(chunk, idx))
            ok = np.array_equal(got, want)

            @functools.partial(jax.jit, static_argnums=(2,))
            def pk_n(chunk, idx, n):
                def body(acc, _):
                    idp = idx + (acc * 1e-30).astype(jnp.int32)
                    r = pk(chunk, idp)
                    return acc + jnp.sum(r, dtype=jnp.float32) * 1e-20, None
                acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
                return acc
            t = slope_time(lambda n: device_sync(pk_n(chunk, idx, n)))
            print(f"  {name}: correct={ok}  {t/M*1e9:7.2f} ns/row", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    def call(kern):
        @jax.jit
        def pk(chunk, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, chunk)
        return pk

    def k_take(idx_ref, chunk_ref, out_ref):
        out_ref[:] = jnp.take(chunk_ref[:], idx_ref[:], axis=0)

    def k_tala(idx_ref, chunk_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[:][:, None], (M, D))
        out_ref[:] = jnp.take_along_axis(chunk_ref[:], ii, axis=0)

    def k_onehot(idx_ref, chunk_ref, out_ref):
        iota = lax.broadcasted_iota(jnp.int32, (M, C), 1)
        oh = (idx_ref[:][:, None] == iota).astype(jnp.float32)
        out_ref[:] = jnp.dot(oh, chunk_ref[:],
                             preferred_element_type=jnp.float32)

    def k_adv(idx_ref, chunk_ref, out_ref):
        out_ref[:] = chunk_ref[idx_ref[:]]

    bench("take           ", call(k_take))
    bench("take_along_axis", call(k_tala))
    bench("one-hot matmul ", call(k_onehot))
    bench("advanced index ", call(k_adv))

    # XLA-side rates for the partition machinery, B=65536:
    B = 65536
    ids = jnp.asarray(rng.integers(0, 1 << 20, B), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def sortpair_n(ids, n):
        def body(acc, _):
            idp = ids + (acc * 1e-30).astype(jnp.int32)
            s, p = lax.sort_key_val(idp, jnp.arange(B, dtype=jnp.int32))
            return acc + (jnp.sum(s) + jnp.sum(p)).astype(jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    t = slope_time(lambda n: device_sync(sortpair_n(ids, n)))
    print(f"  XLA sort_key_val B=65536: {t*1e3:.3f} ms", flush=True)

    @functools.partial(jax.jit, static_argnums=(1,))
    def scatter_n(ids, n):
        pos = jnp.arange(B, dtype=jnp.int32)

        def body(acc, _):
            idp = (ids + (acc * 1e-30).astype(jnp.int32)) % B
            out = jnp.zeros((B,), jnp.int32).at[idp].set(pos, mode="drop")
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    t = slope_time(lambda n: device_sync(scatter_n(ids, n)))
    print(f"  XLA B-elem scatter into [B]: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
