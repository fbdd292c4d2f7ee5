#!/usr/bin/env python
"""Round-5 A/B: the packed-update tail (taken = take(comb_pad, slot);
new = packed - taken) runs as TWO full-table kernels in the step trace
(fusion:f32[500000,74] 0.67 ms + sub:f32[500000,74] 1.14 ms per table)
where a single fused gather->subtract pass would be ~0.45 ms.  Questions:

  A. current two-op form, per table           (take then sub)
  B. pure sub roofline                        (a - b, both [N,74])
  C. pure take roofline                       (take(comb_pad, slot))
  D. superarray: ONE take+sub over the 5 tables concatenated row-wise
     (slot/comb offsets folded in) -- per-kernel overhead probe
  E. negated-comb form: packed + take(neg_comb, slot) (add vs sub)

All on [500000, 74] f32 x 5 tables, slot maps ~13% of rows to real
comb rows (the B=65536 regime).  Fenced + slope-timed like bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_sync

NP_, DPA, B, T = 500_000, 74, 65_536, 5


def timed(fn, args, n=20):
    fn(*args)  # compile+warm
    outs = []
    for reps in (5, 5 + n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*args)
            device_sync(r if isinstance(r, jnp.ndarray) else r[0])
            best = min(best, time.perf_counter() - t0)
        outs.append(best)
    return (outs[1] - outs[0]) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    packs = [jnp.asarray(rng.standard_normal((NP_, DPA)), jnp.float32)
             for _ in range(T)]
    combs = [jnp.asarray(rng.standard_normal((B + 1, DPA)), jnp.float32)
             for _ in range(T)]
    slots = []
    for _ in range(T):
        s = np.full((NP_,), B, np.int32)
        touched = rng.choice(NP_, size=B, replace=False)
        s[touched] = rng.integers(0, B, B)
        slots.append(jnp.asarray(s))

    @jax.jit
    def form_a(packs, combs, slots):
        return [p - jnp.take(c, s, axis=0, mode="clip")
                for p, c, s in zip(packs, combs, slots)]

    @jax.jit
    def form_b(packs):
        return [p - p * jnp.float32(0.5) for p in packs]

    @jax.jit
    def form_c(combs, slots):
        return [jnp.take(c, s, axis=0, mode="clip")
                for c, s in zip(combs, slots)]

    # superarray: concat tables row-wise; comb rows get per-table offsets
    scomb = jnp.concatenate(combs, axis=0)                   # [(B+1)*T, 74]
    sslot = jnp.concatenate([s + jnp.int32(t * (B + 1))
                             for t, s in enumerate(slots)])  # [N*T]
    spack = jnp.concatenate(packs, axis=0)                   # [N*T, 74]

    @jax.jit
    def form_d(spack, scomb, sslot):
        return spack - jnp.take(scomb, sslot, axis=0, mode="clip")

    negc = [-c for c in combs]

    @jax.jit
    def form_e(packs, negc, slots):
        return [p + jnp.take(c, s, axis=0, mode="clip")
                for p, c, s in zip(packs, negc, slots)]

    print(f"A take+sub x{T}:      {timed(form_a, (packs, combs, slots)):7.3f} ms")
    print(f"B sub roofline x{T}:  {timed(form_b, (packs,)):7.3f} ms")
    print(f"C take roofline x{T}: {timed(form_c, (combs, slots)):7.3f} ms")
    print(f"D superarray take+sub:{timed(form_d, (spack, scomb, sslot)):7.3f} ms")
    print(f"E add-neg x{T}:       {timed(form_e, (packs, negc, slots)):7.3f} ms")


if __name__ == "__main__":
    main()
