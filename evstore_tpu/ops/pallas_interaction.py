"""Fused Pallas dot-interaction kernel.

Computes concat(x, tril(feats @ feats^T)) for DLRM's pairwise feature
interaction (reference: interact_features, dlrm_s_pytorch.py:483-505) in one
kernel: the per-sample Gram matrix runs on the MXU and the lower-triangle
extraction is expressed as a second MXU matmul against a constant 0/1
selection matrix (gathers with dynamic addressing are weak on TPU; a
[F*F, P] selection matmul keeps everything in the systolic array).

Output layout matches ops/interaction.py: [B, D + P], P = (T+1)T/2
(+T+1 with self-interaction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evstore_tpu.ops.interaction import _tril_indices


@functools.lru_cache(maxsize=None)
def _row_selectors(num_features: int, self_interaction: bool) -> np.ndarray:
    """[F, F, P] stack of selectors: M[f][g, p] == 1 iff pair p is
    (li=f, lj=g).  Mosaic cannot reshape [Bt, F, F] -> [Bt, F*F] (lane-dim
    merging), so the tril extraction runs as F accumulation matmuls
    pairs += gram[:, f, :] @ M[f] — all MXU, no reshapes."""
    li, lj = _tril_indices(num_features, self_interaction)
    P = len(li)
    sel = np.zeros((num_features, num_features, P), np.float32)
    for p, (i, j) in enumerate(zip(li, lj)):
        sel[i, j, p] = 1.0
    return sel


def _interaction_kernel(x_ref, ly_ref, sel_ref, out_ref):
    F = ly_ref.shape[1] + 1
    x = x_ref[:].astype(jnp.float32)
    feats = jnp.concatenate([x[:, None, :], ly_ref[:].astype(jnp.float32)],
                            axis=1)                      # [Bt, F, D]
    # precision=HIGHEST: the MXU demotes f32 operands to bf16 by default
    # (preferred_element_type only fixes the ACCUMULATOR); the interaction
    # must match the fp32 XLA path bit-for-bit-ish, so force the 3-pass
    # f32 algorithm on both dots.
    gram = jax.lax.dot_general(
        feats, feats, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [Bt, F, F]
    P = sel_ref.shape[2]
    pairs = jnp.zeros((x.shape[0], P), jnp.float32)
    for f in range(F):
        pairs = pairs + jnp.dot(gram[:, f, :], sel_ref[f],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.concatenate([x, pairs], axis=1).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dot_interaction_pallas(x: jax.Array, ly: jax.Array,
                           self_interaction: bool = False,
                           tile_b: int = 128,
                           interpret: bool = False) -> jax.Array:
    """x [B, D], ly [B, T, D] -> [B, D + P].  Differentiable: the backward
    pass (pallas_call has no autodiff) runs as plain XLA ops — the
    cotangent scatter + two small batched matmuls."""
    return _dot_interaction_pallas_impl(x, ly, self_interaction, tile_b,
                                        interpret)


def _interaction_fwd(x, ly, self_interaction, tile_b, interpret):
    out = _dot_interaction_pallas_impl(x, ly, self_interaction, tile_b,
                                       interpret)
    return out, (x, ly)


def _interaction_bwd(self_interaction, tile_b, interpret, res, g):
    x, ly = res
    B, D = x.shape
    T = ly.shape[1]
    F = T + 1
    li, lj = _tril_indices(F, self_interaction)
    feats = jnp.concatenate([x[:, None, :].astype(jnp.float32),
                             ly.astype(jnp.float32)], axis=1)
    gpairs = g[:, D:].astype(jnp.float32)                    # [B, P]
    dgram = jnp.zeros((B, F, F), jnp.float32).at[
        :, jnp.asarray(li), jnp.asarray(lj)].add(gpairs)
    # gram = feats feats^T  =>  dfeats = (dgram + dgram^T) feats
    sym = dgram + jnp.swapaxes(dgram, 1, 2)
    dfeats = jnp.einsum("bfg,bgd->bfd", sym, feats,
                        preferred_element_type=jnp.float32)
    dx = (dfeats[:, 0, :] + g[:, :D].astype(jnp.float32)).astype(x.dtype)
    dly = dfeats[:, 1:, :].astype(ly.dtype)
    return dx, dly


dot_interaction_pallas.defvjp(_interaction_fwd, _interaction_bwd)


@functools.partial(jax.jit,
                   static_argnames=("self_interaction", "tile_b", "interpret"))
def _dot_interaction_pallas_impl(x: jax.Array, ly: jax.Array,
                                 self_interaction: bool = False,
                                 tile_b: int = 128,
                                 interpret: bool = False) -> jax.Array:
    """x [B, D], ly [B, T, D] -> [B, D + P]."""
    B, D = x.shape
    T = ly.shape[1]
    F = T + 1
    sel = _row_selectors(F, self_interaction)
    P = sel.shape[2]
    tile_b = min(tile_b, B)
    if B % tile_b != 0:
        raise ValueError(f"B={B} not divisible by tile_b={tile_b}")
    grid_spec = pl.GridSpec(
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, D + P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _interaction_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D + P), x.dtype),
        interpret=interpret,
    )(x, ly, jnp.asarray(sel))
