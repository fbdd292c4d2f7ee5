"""Why does the pallas update win isolated (24 vs 66 ms) but lose in the
full train step (60.8 vs 49.1 ms)?  Suspects timed fenced+slope."""
import functools, json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from bench import device_sync
from evstore_tpu.ops import pallas_update as pu

def slope(run, lo, hi, reps=3):
    run(lo); ts = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); run(n); best = min(best, time.perf_counter()-t0)
        ts[n] = best
    return (ts[hi]-ts[lo])/(hi-lo)

rng = np.random.default_rng(0)
N, D, B, T5 = 1_000_000, 36, 32768, 5
idxmat = jnp.asarray(np.stack([rng.integers(0, N, B) for _ in range(26)], 1), jnp.int32)
g5 = {k: jnp.asarray(rng.normal(0, 1e-3, (B, D)).astype(np.float32)).astype(jnp.bfloat16)
      for k in range(T5)}
tabs5 = {k: jnp.asarray(rng.uniform(-0.1, 0.1, (N, D)).astype(np.float32)).astype(jnp.bfloat16)
         for k in range(T5)}
sts5 = {k: jnp.zeros((N,), jnp.float32) for k in range(T5)}
out = {}

# (a) argsort of 5 sliced columns
@functools.partial(jax.jit, static_argnums=(1,))
def argsort_n(acc0, n):
    def body(acc, _):
        z = jnp.int32(acc * 1e-30)
        s = jnp.float32(0)
        for k in range(T5):
            o = jnp.argsort(idxmat[:, k] + z)
            s = s + jnp.sum(o).astype(jnp.float32)
        return acc + s * 1e-20, None
    acc, _ = lax.scan(body, acc0, None, length=n)
    return acc
out["argsort5_ms"] = slope(lambda n: device_sync(argsort_n(jnp.float32(0), n)), 4, 16) * 1e3
print(f"argsort x5 (sliced cols): {out['argsort5_ms']:.2f} ms", flush=True)

# (b) full prep x5 (argsort + takes + pads + searchsorted), no kernel
@functools.partial(jax.jit, static_argnums=(1,))
def prep_n(acc0, n):
    def body(acc, _):
        z = jnp.int32(acc * 1e-30)
        s = jnp.float32(0)
        for k in range(T5):
            ids = idxmat[:, k] + z
            g = g5[k].astype(jnp.float32)
            order = jnp.argsort(ids)
            rows_sorted = jnp.take(ids, order)
            g_sorted = jnp.take(g, order, axis=0)
            nch = -(-B // pu.CHUNK) + pu.NBUF + 1
            rows_pad = jnp.full((nch * pu.CHUNK,), jnp.iinfo(jnp.int32).max, jnp.int32)
            rows_pad = lax.dynamic_update_slice(rows_pad, rows_sorted, (0,))
            gc_pad = jnp.zeros((nch * pu.CHUNK, pu.GC_LANES), jnp.float32)
            gc_pad = lax.dynamic_update_slice(gc_pad, g_sorted, (0, 0))
            n_tiles = -(-N // 2048)
            bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * 2048
            starts = jnp.searchsorted(rows_sorted, bounds).astype(jnp.int32)
            s = s + jnp.sum(gc_pad) + jnp.sum(starts).astype(jnp.float32) + jnp.sum(rows_pad).astype(jnp.float32)
        return acc + s * 1e-20, None
    acc, _ = lax.scan(body, acc0, None, length=n)
    return acc
out["prep5_ms"] = slope(lambda n: device_sync(prep_n(jnp.float32(0), n)), 4, 16) * 1e3
print(f"full prep x5: {out['prep5_ms']:.2f} ms", flush=True)

# (c) 5-table pallas update with sliced ids + bf16 grads (the in-program shape)
@functools.partial(jax.jit, static_argnums=(2,))
def pal_n(tabs, sts, n):
    def body(c, _):
        ts_, ss_ = c
        eps = ts_[0][0, 0].astype(jnp.float32) * 1e-30
        nt, ns = {}, {}
        for k in range(T5):
            s2, t2 = pu.rwsadagrad_row_update_pallas(
                ss_[k], ts_[k], idxmat[:, k], g5[k].astype(jnp.float32) + eps, 0.1)
            nt[k], ns[k] = t2, s2
        return (nt, ns), None
    (ts_, ss_), _ = lax.scan(body, (tabs, sts), None, length=n)
    return (sum(jnp.sum(v.astype(jnp.float32)) for v in ts_.values())
            + sum(jnp.sum(v) for v in ss_.values()))
out["pallas5_sliced_ms"] = slope(lambda n: device_sync(pal_n(tabs5, sts5, n)), 4, 16) * 1e3
print(f"pallas x5 (sliced ids, bf16 g): {out['pallas5_sliced_ms']:.2f} ms", flush=True)
print(json.dumps(out))
