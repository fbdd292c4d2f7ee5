"""Row-width sweep for HBM gather/scatter (round-4 layout decision).

gather_microbench found D=128 f32 gathers 4.3x faster PER ROW than D=36
(10.4 vs 44.5 ns/row at N=1M).  This measures, at N=1M f32:
  - gather ns/row for D in {36, 64, 72, 128} (+ slice-to-36 consumer)
  - scatter-add ns/row for D in {36, 128}
to decide whether big tables should store a padded [N, 128] layout.
"""
import functools, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import device_sync
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir",
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                  + "/.jax_cache")


def slope_time(run_n, n_lo=4, n_hi=16, reps=3):
    run_n(n_lo)
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


rng = np.random.default_rng(0)
N, B = 1 << 20, 65536
ids = jnp.asarray(rng.integers(0, N, B), jnp.int32)

print("gather, f32, N=1M, B=65536:", flush=True)
for D in (36, 64, 72, 128):
    tab = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def take_n(tab, ids, n):
        def body(acc, _):
            idp = ids + (acc * 1e-30).astype(jnp.int32)
            rows = jnp.take(tab, idp, axis=0)[:, :36]
            return acc + jnp.sum(rows, dtype=jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    t = slope_time(lambda n: device_sync(take_n(tab, ids, n)))
    print(f"  D={D:>4}: {t/B*1e9:7.2f} ns/row  ({t*1e3:6.2f} ms)", flush=True)

print("scatter-add (unique ids), f32, N=1M, B=65536:", flush=True)
uids = jnp.asarray(np.random.default_rng(1).permutation(N)[:B].astype(np.int32))
for D in (36, 128):
    tab = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    upd = jnp.asarray(rng.standard_normal((B, D)) * 1e-6, jnp.float32)

    @functools.partial(jax.jit, static_argnums=(3,))
    def scat_n(tab, uids, upd, n):
        def body(t_, _):
            t2 = t_.at[uids].add(upd + jnp.sum(t_[:1, :1]) * 1e-30,
                                 unique_indices=True)
            return t2, None
        t2, _ = lax.scan(body, tab, None, length=n)
        return jnp.sum(t2[:2])
    t = slope_time(lambda n: device_sync(scat_n(tab, uids, upd, n)), 2, 8)
    print(f"  D={D:>4}: {t/B*1e9:7.2f} ns/row  ({t*1e3:6.2f} ms)", flush=True)
