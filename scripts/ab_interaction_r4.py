"""Round-4 interaction A/B at B=32768/65536: fwd+bwd of dot_interaction
variants (isolated; winners re-measured in the full step).

Variants:
  current   concat feats -> gram einsum (HIGHEST) -> selection matmul
  noconcat  xly einsum + ly-gram einsum -> combined selection matmul
            (order-preserving via a [T+T*T, P] selection matrix)
  fusedW1   selection folded into the top-MLP first layer:
            z1 = x @ W1x + gram_flat @ (S @ W1f) — the [B, P] flat rows
            never materialize
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
            t0 = time.perf_counter(); run_n(n)
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
    from evstore_tpu.ops.interaction import _tril_select, dot_interaction

    B, T, D, H = 65536, 26, 36, 512
    F = T + 1
    P = F * (F - 1) // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    ly = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    W1 = jnp.asarray(rng.standard_normal((D + P, H)) * 0.05, jnp.float32)

    S = np.asarray(_tril_select(F, False))          # [F*F, P]
    # order-preserving split selection: rows 0..T-1 = xly pairs (i,0),
    # rows T.. = ly-gram flat; column order unchanged
    li, lj = np.tril_indices(F, -1)
    S2 = np.zeros((T + T * T, P), np.float32)
    for col, (i, j) in enumerate(zip(li, lj)):
        if j == 0:
            S2[i - 1, col] = 1.0                      # <ly_{i-1}, x>
        else:
            S2[T + (i - 1) * T + (j - 1), col] = 1.0  # <ly_{i-1}, ly_{j-1}>
    S2 = jnp.asarray(S2)
    Sj = jnp.asarray(S)

    def cur(x, ly):
        z = dot_interaction(x, ly)
        return z @ W1.astype(z.dtype)

    def noconcat(x, ly):
        xly = jnp.einsum("bd,btd->bt", x, ly,
                         preferred_element_type=jnp.float32)      # [B, T]
        gly = jnp.einsum("btd,bsd->bts", ly, ly,
                         preferred_element_type=jnp.float32)      # [B,T,T]
        cat = jnp.concatenate([xly, gly.reshape(B, T * T)],
                              axis=1).astype(x.dtype)
        flat = jnp.dot(cat, S2.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        z = jnp.concatenate([x, flat], axis=1)
        return z @ W1.astype(z.dtype)

    def fusedW1(x, ly):
        feats = jnp.concatenate([x[:, None, :], ly], axis=1)
        gram = jnp.einsum("bfd,bgd->bfg", feats, feats,
                          preferred_element_type=jnp.float32)
        SW = jnp.dot(Sj, W1[D:],
                     preferred_element_type=jnp.float32)          # [F*F, H]
        z1 = (x.astype(jnp.float32) @ W1[:D]
              + jnp.dot(gram.reshape(B, F * F), SW,
                        preferred_element_type=jnp.float32))
        return z1.astype(x.dtype)

    for name, fn in (("current ", cur), ("noconcat", noconcat),
                     ("fusedW1 ", fusedW1)):
        def loss(x, ly):
            return jnp.sum(fn(x, ly).astype(jnp.float32) ** 2) * 1e-9

        g = jax.grad(loss, argnums=(0, 1))

        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(x, ly, n):
            def body(acc, _):
                xp = x + acc.astype(x.dtype) * 1e-30
                gx, gly = g(xp, ly)
                return acc + (jnp.sum(gx.astype(jnp.float32))
                              + jnp.sum(gly.astype(jnp.float32))) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        t = slope_time(lambda n: device_sync(run_n(x, ly, n)))
        # value check vs current
        v = np.asarray(fn(x, ly), np.float32)
        v0 = np.asarray(cur(x, ly), np.float32)
        err = float(np.max(np.abs(v - v0)) / (np.abs(v0).max() + 1e-9))
        print(f"{name}: fwd+bwd {t*1e3:7.2f} ms   max-rel-err vs current "
              f"{err:.2e}", flush=True)


if __name__ == "__main__":
    main()
