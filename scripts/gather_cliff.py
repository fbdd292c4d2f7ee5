"""Phase-2 gather experiments (round 4 headline).

gather_microbench.py found a ~20x cliff: jnp.take from a 9.4 MB operand runs
at ~2.2 ns/row while the same gather from a 144 MB operand runs at 30-60
ns/row.  Hypothesis: small operands are gathered in VMEM (vectorized),
HBM-resident operands take a serialized path.

  1. locate the cliff: N sweep at D=36 f32, R=65536
  2. pure-XLA chunk sweep: scan over dynamic-sliced chunks + in-"VMEM" take
     + masked accumulate, vs the direct gather (N=1M, B=65536)
  3. does Mosaic lower a vectorized jnp.take inside a kernel?
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import device_sync


def slope_time(run_n, n_lo=4, n_hi=16, reps=3):
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    rng = np.random.default_rng(0)
    D = 36
    B = 65536

    @functools.partial(jax.jit, static_argnums=(2,))
    def take_n(tab, ids, n):
        def body(acc, _):
            idp = ids + (acc * 1e-30).astype(jnp.int32)
            rows = jnp.take(tab, idp, axis=0)
            return acc + jnp.sum(rows, dtype=jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    print("=== 1. operand-size cliff (D=36 f32, R=65536) ===", flush=True)
    for N in (1 << 16, 1 << 17, 1 << 18, 3 << 17, 1 << 19, 1 << 20, 4 << 20):
        tab = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        t = slope_time(lambda n: device_sync(take_n(tab, ids, n)))
        print(f"  N={N:>8} ({N*D*4/1e6:7.1f} MB): {t/B*1e9:7.2f} ns/row "
              f"({B/t/1e6:7.1f} Mrow/s)", flush=True)

    print("=== 2. pure-XLA chunk sweep (N=1M, B=65536) ===", flush=True)
    N = 1 << 20
    tab = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, B), jnp.int32)

    for C in (1 << 16, 1 << 17):
        n_chunks = N // C

        @functools.partial(jax.jit, static_argnums=(2,))
        def sweep_n(tab, ids, n, C=C, n_chunks=n_chunks):
            def body(acc, _):
                idp = ids + (acc * 1e-30).astype(jnp.int32)

                def chunk_body(out, c):
                    chunk = lax.dynamic_slice_in_dim(tab, c * C, C)
                    loc = idp - c * C
                    m = (loc >= 0) & (loc < C)
                    sel = jnp.take(chunk, jnp.clip(loc, 0, C - 1), axis=0)
                    return out + sel * m[:, None].astype(sel.dtype), None

                out, _ = lax.scan(chunk_body, jnp.zeros((B, D), jnp.float32),
                                  jnp.arange(n_chunks))
                return acc + jnp.sum(out, dtype=jnp.float32) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        t = slope_time(lambda n: device_sync(sweep_n(tab, ids, n)), 2, 8)
        print(f"  sweep C={C}: {t*1e3:7.2f} ms ({t/B*1e9:6.1f} ns/row)",
              flush=True)

    t = slope_time(lambda n: device_sync(take_n(tab, ids, n)))
    print(f"  direct take: {t*1e3:7.2f} ms ({t/B*1e9:6.1f} ns/row)", flush=True)

    print("=== 3. Mosaic in-kernel vectorized take ===", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = 1 << 14  # 16k-row chunk = 2.4 MB

    def kern(idx_ref, chunk_ref, out_ref):
        out_ref[:] = jnp.take(chunk_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pk(chunk, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((idx.shape[0], D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, chunk)

    chunk = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    cids = jnp.asarray(rng.integers(0, C, 4096), jnp.int32)
    try:
        got = np.asarray(pk(chunk, cids))
        want = np.asarray(jnp.take(chunk, cids, axis=0))
        ok = np.array_equal(got, want)
        print(f"  compiles: yes, correct: {ok}", flush=True)

        @functools.partial(jax.jit, static_argnums=(2,))
        def pk_n(chunk, cids, n):
            def body(acc, _):
                idp = cids + (acc * 1e-30).astype(jnp.int32)
                r = pk(chunk, idp)
                return acc + jnp.sum(r, dtype=jnp.float32) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        t = slope_time(lambda n: device_sync(pk_n(chunk, cids, n)), 8, 32)
        print(f"  in-kernel take of 4096 rows: {t*1e6:.1f} us "
              f"({t/4096*1e9:.2f} ns/row)", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
