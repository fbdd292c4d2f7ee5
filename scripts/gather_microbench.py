"""What governs XLA's big-table row-gather cost on this chip?

Round-3 measured ~17 ns/row at D=36 f32 regardless of table size, i.e.
~8.5 GB/s effective -- 1.3% of measured HBM bandwidth.  Before building a
round-4 kernel we need to know WHICH resource binds:

  - issue rate (rows/s constant vs D)    -> pack more bytes per row
  - bandwidth  (bytes/s constant vs D)   -> reduce bytes (bf16/int8 rows)
  - locality   (sorted vs random ids)    -> sort/bin first

Sweeps jnp.take over D in {36,128,512}, dtype {f32,bf16}, sorted vs random,
plus a fused mega-table gather (all 14 big tables as one [sum N, D] array,
one gather) vs 14 sequential gathers.  Fenced+slope timed (bench.py rules).
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
    R = 1 << 20  # rows gathered per step (~ the 14 big tables x B=65536 / 14)

    @functools.partial(jax.jit, static_argnums=(2,))
    def take_n(tab, ids, n):
        def body(acc, _):
            # carry-perturb the ids (runtime +0) so the body is not
            # loop-invariant and cannot be hoisted (profile_train_step.py
            # lesson: v1 printed negative times)
            idp = ids + (acc * 1e-30).astype(jnp.int32)
            rows = jnp.take(tab, idp, axis=0)
            return acc + jnp.sum(rows, dtype=jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    print(f"{'N':>9} {'D':>4} {'dtype':>8} {'sorted':>6} {'ns/row':>8} "
          f"{'GB/s':>7}")
    for N in (1 << 16, 1 << 20):
        for D in (36, 128, 512):
            for dt in (jnp.float32, jnp.bfloat16):
                tab = jnp.asarray(rng.standard_normal((N, D)), dt)
                ids_r = jnp.asarray(rng.integers(0, N, R), jnp.int32)
                for srt in (False, True):
                    ids = jnp.sort(ids_r) if srt else ids_r
                    t = slope_time(lambda n: device_sync(take_n(tab, ids, n)))
                    bytes_row = D * tab.dtype.itemsize
                    print(f"{N:>9} {D:>4} {np.dtype(dt).name:>8} {srt!s:>6} "
                          f"{t/R*1e9:>8.1f} {R*bytes_row/t/1e9:>7.1f}",
                          flush=True)

    # one fused mega gather vs 14 sequential table gathers (D=36 f32)
    D = 36
    sizes = [3194, 5652, 5683, 12517, 14992, 93145, 142572, 286181] + [1000000] * 6
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1])
    B = 65536
    mega = jnp.asarray(rng.standard_normal((total, D)), jnp.float32)
    ids_loc = [rng.integers(0, s, B) for s in sizes]
    ids_glob = jnp.asarray(np.concatenate(
        [i + o for i, o in zip(ids_loc, offs[:-1])]), jnp.int32)
    ids_tabs = [jnp.asarray(i, jnp.int32) for i in ids_loc]
    tabs = [mega[int(o):int(o) + s] for o, s in zip(offs[:-1], sizes)]
    R14 = B * len(sizes)

    @functools.partial(jax.jit, static_argnums=(2,))
    def seq_n(tabs, ids, n):
        def body(acc, _):
            s = jnp.float32(0)
            p = (acc * 1e-30).astype(jnp.int32)
            for t, i in zip(tabs, ids):
                s += jnp.sum(jnp.take(t, i + p, axis=0), dtype=jnp.float32)
            return acc + s * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    t = slope_time(lambda n: device_sync(seq_n(tabs, ids_tabs, n)))
    print(f"14 sequential gathers: {t*1e3:8.2f} ms  ({t/R14*1e9:.1f} ns/row)")
    t = slope_time(lambda n: device_sync(take_n(mega, ids_glob, n)))
    print(f"1 fused mega gather:   {t*1e3:8.2f} ms  ({t/R14*1e9:.1f} ns/row)")


if __name__ == "__main__":
    main()
