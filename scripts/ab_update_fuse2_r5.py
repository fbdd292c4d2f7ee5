#!/usr/bin/env python
"""Round-5 A/B part 2: shrink the take's comb operand below the gather
VMEM cliff (~10 MB, EXPERIMENTS §21).  comb_pad [65537,74] f32 = 19.4 MB
sits ABOVE it (measured 1.39 ms/table); candidates:

  F. bf16 comb:            [65537,74] bf16 = 9.7 MB   (lossy deltas)
  G. f32 lane-split halves: 2x [65537,40/34] < 10 MB  (exact)
  H. f32 lane-split, fused sub per half + lane-concat output
  I. half-B comb (b=32769 rows, f32) -- cliff position probe
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

    combs16 = [c.astype(jnp.bfloat16) for c in combs]

    @jax.jit
    def form_f(packs, combs16, slots):
        return [p - jnp.take(c, s, axis=0, mode="clip").astype(jnp.float32)
                for p, c, s in zip(packs, combs16, slots)]

    H1 = 40
    combs_a = [c[:, :H1] for c in combs]
    combs_b = [c[:, H1:] for c in combs]

    @jax.jit
    def form_g(packs, combs_a, combs_b, slots):
        return [p - jnp.concatenate(
            [jnp.take(ca, s, axis=0, mode="clip"),
             jnp.take(cb, s, axis=0, mode="clip")], axis=1)
            for p, ca, cb, s in zip(packs, combs_a, combs_b, slots)]

    @jax.jit
    def form_h(packs, combs_a, combs_b, slots):
        return [jnp.concatenate(
            [p[:, :H1] - jnp.take(ca, s, axis=0, mode="clip"),
             p[:, H1:] - jnp.take(cb, s, axis=0, mode="clip")], axis=1)
            for p, ca, cb, s in zip(packs, combs_a, combs_b, slots)]

    half = (B + 1) // 2 + 1
    combs_half = [c[:half] for c in combs]
    slots_half = [jnp.minimum(s, half - 1) for s in slots]

    @jax.jit
    def form_i(packs, combs_half, slots_half):
        return [p - jnp.take(c, s, axis=0, mode="clip")
                for p, c, s in zip(packs, combs_half, slots_half)]

    print(f"F bf16 comb take+sub x{T}:   {timed(form_f, (packs, combs16, slots)):7.3f} ms")
    print(f"G split take,concat,sub x{T}:{timed(form_g, (packs, combs_a, combs_b, slots)):7.3f} ms")
    print(f"H split fused halves x{T}:   {timed(form_h, (packs, combs_a, combs_b, slots)):7.3f} ms")
    print(f"I half-rows f32 comb x{T}:   {timed(form_i, (packs, combs_half, slots_half)):7.3f} ms")


if __name__ == "__main__":
    main()
