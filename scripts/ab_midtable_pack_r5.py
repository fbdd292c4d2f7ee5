#!/usr/bin/env python
"""Round-5: should MID-size tables (10-48 MB) pack too?

The packed big-table layout (§21) engages above 48 MB and only for even
row counts.  The kaggle mid tables (286181 = 41 MB odd, 142572 = 20.5 MB,
93145 = 13.4 MB odd) sit in the gather cliff's transition zone and keep
narrow 36-lane update passes.  Measure, per table size, B=65536:

  - gather from [N, 36] f32 (current)    vs [ceil(N/2), 72] (packed)
  - the dense-grad update pass (current) vs packed rep-trick take+sub
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_sync

B = 65_536
SIZES = [286_181, 142_572, 93_145]


def timed(fn, args, n=30):
    fn(*args)
    outs = []
    for reps in (5, 5 + n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*args)
            device_sync(jax.tree_util.tree_leaves(r)[0])
            best = min(best, time.perf_counter() - t0)
        outs.append(best)
    return (outs[1] - outs[0]) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    for n in SIZES:
        npad = (n + 1) // 2 * 2
        tab = jnp.asarray(rng.standard_normal((n, 36)), jnp.float32)
        tabp = jnp.asarray(rng.standard_normal((npad // 2, 72)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, n, B), jnp.int32)

        @jax.jit
        def g_plain(tab, ids):
            return jnp.take(tab, ids, axis=0, mode="clip")

        @jax.jit
        def g_packed(tabp, ids):
            rows = jnp.take(tabp, ids // 2, axis=0, mode="clip")
            sub = jnp.broadcast_to((ids % 2).astype(jnp.int32)[:, None],
                                   (B, 36))
            return jax.lax.select_n(sub, rows[:, :36], rows[:, 36:])

        # dense-grad update pass (current mid-table path): zeros+scatter-add
        # then one fused apply pass
        @jax.jit
        def u_dense(tab, ids, g):
            G = jnp.zeros((n, 36), jnp.float32).at[ids].add(g, mode="drop")
            return tab - 0.1 * G

        # packed rep-trick take+sub (what packing would use)
        @jax.jit
        def u_packed(tabp, ids, g):
            q = ids // 2
            oh = ((ids % 2)[:, None] ==
                  jnp.arange(2, dtype=jnp.int32)[None, :]).astype(jnp.float32)
            gw = jnp.concatenate([g * oh[:, :1], g * oh[:, 1:]], axis=1)
            npk = npad // 2
            slot = jnp.full((npk,), B, jnp.int32).at[q].set(
                jnp.arange(B, dtype=jnp.int32), mode="drop")
            rep = slot.at[q].get(mode="fill", fill_value=B)
            Gc = jax.ops.segment_sum(gw, rep, num_segments=B + 1)[:B]
            pad = jnp.concatenate([Gc, jnp.zeros((1, 72), jnp.float32)])
            taken = jnp.take(pad, jnp.minimum(slot, B), axis=0, mode="clip")
            return tabp - 0.1 * taken

        g = jnp.asarray(rng.standard_normal((B, 36)), jnp.float32)
        print(f"N={n:7d} ({n*36*4/1e6:5.1f} MB): "
              f"gather {timed(g_plain, (tab, ids)):6.3f} -> "
              f"packed {timed(g_packed, (tabp, ids)):6.3f} ms | "
              f"update {timed(u_dense, (tab, ids, g)):6.3f} -> "
              f"packed {timed(u_packed, (tabp, ids, g)):6.3f} ms")


if __name__ == "__main__":
    main()
