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


# ------------------------------------------------- sample-blocked kernel (r5)
#
# The per-sample batched gram above runs the MXU at ~5.5 TF/s on v5e (27x36
# operands pad each 128x128 tile to ~1% useful work).  Blocking G samples'
# feature matrices into ONE [G*F, D] operand and taking its full [G*F, G*F]
# gram computes G extra cross-sample blocks (discarded) but tiles the MXU
# properly: measured 158 TF/s for the G=4 XLA form (scripts/ab_gram_r5.py).
# The kernel below keeps the group gram entirely in VMEM, extracts the G
# diagonal blocks, and applies the tril selection as one [F*F, P] matmul —
# only [BS, D+P] ever reaches HBM.  The backward runs the mirror image
# (pairs -> symmetrized gram rows -> block-diagonal operand -> dfeats).
# Reference semantics unchanged: interact_features, dlrm_s_pytorch.py:483-516.


@functools.lru_cache(maxsize=None)
def _flat_select(num_features: int, self_interaction: bool) -> np.ndarray:
    """[F*F, P] 0/1 matrix: column p selects gram element (li[p], lj[p])."""
    li, lj = _tril_indices(num_features, self_interaction)
    s = np.zeros((num_features * num_features, len(li)), np.float32)
    s[li * num_features + lj, np.arange(len(li))] = 1.0
    return s


@functools.lru_cache(maxsize=None)
def _sym_select(num_features: int, self_interaction: bool) -> np.ndarray:
    """[P, F*F] backward selector: row p writes its cotangent into gram
    slots (li,lj) AND (lj,li) — the symmetrization dL/dG + (dL/dG)^T folded
    into the selection (diagonal pairs get a single 1)."""
    li, lj = _tril_indices(num_features, self_interaction)
    P = len(li)
    s = np.zeros((P, num_features * num_features), np.float32)
    for p, (i, j) in enumerate(zip(li, lj)):
        s[p, i * num_features + j] = 1.0
        if i != j:
            s[p, j * num_features + i] = 1.0
    return s


def _blocked_fwd_kernel(G: int, x_ref, ly_ref, sel_ref, out_ref, r3, rcat):
    # All values stay 2D: Mosaic cannot shape-cast 2D<->3D values
    # ([BS, D] -> [BS, 1, D] broadcast fails infer-vector-layout), but
    # int-indexing a 3D REF to a 2D slot works both ways.
    BS, D = x_ref.shape
    T = ly_ref.shape[1]
    F = T + 1
    f32 = x_ref.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    for g in range(BS // G):
        parts = []
        for k in range(G):
            s = g * G + k
            parts.append(x_ref[s:s + 1, :])                      # [1, D]
            parts.append(ly_ref[s])                              # [T, D]
        Lg = jnp.concatenate(parts, axis=0)                      # [G*F, D]
        Gg = jax.lax.dot_general(
            Lg, Lg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [G*F, G*F]
        for k in range(G):
            r3[g * G + k] = jax.lax.slice(
                Gg, (k * F, k * F),
                ((k + 1) * F, (k + 1) * F)).astype(r3.dtype)     # [F, F]
    # tril selection as ONE matmul over the lane-concatenated gram rows;
    # Mosaic cannot lane-concat values with mismatched source offsets, so
    # stage the concatenation through a VMEM scratch (stores relayout)
    for f in range(F):
        rcat[:, f * F:(f + 1) * F] = r3[:, f, :]
    pairs = jnp.dot(rcat[:], sel_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST if f32 else None)
    out_ref[:, :D] = x_ref[:]
    out_ref[:, D:] = pairs.astype(out_ref.dtype)


def _blocked_bwd_kernel(G: int, x_ref, ly_ref, g_ref, ssym_ref,
                        dx_ref, dly_ref, ds3, sblk):
    BS, D = x_ref.shape
    T = ly_ref.shape[1]
    F = T + 1
    f32 = x_ref.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    cdt = x_ref.dtype
    gp = g_ref[:, D:]                                            # [BS, P]
    # cotangent -> symmetrized gram rows, one matmul (selection transpose
    # with (li,lj)+(lj,li) folded in)
    symcat = jnp.dot(gp.astype(cdt), ssym_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST if f32 else None)
    # ds3 is laid [F, BS, F] (t leading): Mosaic lowers leading-index 3D
    # ref STORES and middle-index 3D reads, but not middle-index stores
    for t in range(F):
        ds3[t] = symcat[:, t * F:(t + 1) * F].astype(ds3.dtype)
    sblk[:] = jnp.zeros((G * F, G * F), sblk.dtype)
    for g in range(BS // G):
        parts = []
        for k in range(G):
            s = g * G + k
            parts.append(x_ref[s:s + 1, :])
            parts.append(ly_ref[s])
        Lg = jnp.concatenate(parts, axis=0)                      # [G*F, D]
        # block-diagonal cotangent operand lives in scratch: only the
        # diagonal blocks are ever (re)written, off-diagonal zeros persist
        # from the memset above (dynamic_update_slice on values is not
        # lowered by Mosaic; static-slice ref stores are)
        for k in range(G):
            sblk[k * F:(k + 1) * F, k * F:(k + 1) * F] = ds3[:, g * G + k, :]
        if f32:
            dFg = jax.lax.dot_general(
                sblk[:], Lg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                                  # [G*F, D]
        else:
            # hi/lo bf16 split of the f32 cotangent: XLA's bwd keeps the
            # cotangent f32 in a mixed matmul, so a single bf16 demote here
            # loses ~1% relative on dly (measured); two bf16 passes recover
            # f32-operand precision at +0.3 ms/step
            sv = sblk[:]
            hi = sv.astype(cdt)
            lo = (sv - hi.astype(jnp.float32)).astype(cdt)
            dn = (((1,), (0,)), ((), ()))
            dFg = (jax.lax.dot_general(hi, Lg, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(lo, Lg, dimension_numbers=dn,
                                         preferred_element_type=jnp.float32))
        for k in range(G):
            s = g * G + k
            dx_ref[s:s + 1, :] = (
                dFg[k * F:k * F + 1, :]
                + g_ref[s:s + 1, :D].astype(jnp.float32)
            ).astype(dx_ref.dtype)
            dly_ref[s] = dFg[k * F + 1:(k + 1) * F, :].astype(dly_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def dot_interaction_blocked(x: jax.Array, ly: jax.Array,
                            self_interaction: bool = False,
                            tile_b: int = 256, group: int = 4,
                            interpret: bool = False) -> jax.Array:
    """Fused sample-blocked dot interaction: [B, D], [B, T, D] -> [B, D+P].
    Output identical to ops.interaction.dot_interaction (same rounding
    chain: f32-accumulated gram cast to the compute dtype, exact 0/1
    selection).  Both passes are Pallas kernels; see module notes."""
    return _blocked_impl(x, ly, self_interaction, tile_b, group, interpret)


def _blocked_fwd(x, ly, self_interaction, tile_b, group, interpret):
    return (_blocked_impl(x, ly, self_interaction, tile_b, group, interpret),
            (x, ly))


def _blocked_bwd(self_interaction, tile_b, group, interpret, res, g):
    x, ly = res
    return _blocked_bwd_impl(x, ly, g, self_interaction, tile_b, group,
                             interpret)


dot_interaction_blocked.defvjp(_blocked_fwd, _blocked_bwd)


@functools.partial(jax.jit, static_argnames=("self_interaction", "tile_b",
                                             "group", "interpret"))
def _blocked_impl(x, ly, self_interaction, tile_b, group, interpret):
    B, D = x.shape
    T = ly.shape[1]
    F = T + 1
    sel = _flat_select(F, self_interaction)
    P = sel.shape[1]
    BS = min(tile_b, B)
    if B % BS or BS % group:
        raise ValueError(f"B={B} not divisible by tile_b={BS} (group {group})")
    r3_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    kern = functools.partial(_blocked_fwd_kernel, group)
    return pl.pallas_call(
        kern,
        grid=(B // BS,),
        in_specs=[
            pl.BlockSpec((BS, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F * F, P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BS, D + P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D + P), x.dtype),
        scratch_shapes=[pltpu.VMEM((BS, F, F), r3_dtype),
                        pltpu.VMEM((BS, F * F), r3_dtype)],
        # a tight VMEM cap matters more than the kernel itself: without it
        # the pallas_call reserves the whole VMEM budget and XLA stops
        # promoting the update path's [65537,74] take operands to VMEM,
        # turning 1.35 ns/row takes into ~10 ns/row HBM gathers (round-5
        # trace forensics: 5 big-table takes 3.4 -> 21.8 ms/step)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=10 * 1024 * 1024),
        interpret=interpret,
    )(x, ly, jnp.asarray(sel, x.dtype))


@functools.partial(jax.jit, static_argnames=("self_interaction", "tile_b",
                                             "group", "interpret"))
def _blocked_bwd_impl(x, ly, g, self_interaction, tile_b, group, interpret):
    B, D = x.shape
    T = ly.shape[1]
    F = T + 1
    ssym = _sym_select(F, self_interaction)
    P = ssym.shape[0]
    BS = min(tile_b, B)
    # the cotangent scratches stay f32 regardless of input dtype: the
    # bf16 matmul splits them hi/lo at the dot (see kernel)
    r3_dtype = jnp.float32
    kern = functools.partial(_blocked_bwd_kernel, group)
    dx, dly = pl.pallas_call(
        kern,
        grid=(B // BS,),
        in_specs=[
            pl.BlockSpec((BS, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, D + P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, F * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BS, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), ly.dtype)),
        scratch_shapes=[pltpu.VMEM((F, BS, F), r3_dtype),
                        pltpu.VMEM((group * F, group * F), r3_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=10 * 1024 * 1024),
        interpret=interpret,
    )(x, ly, g, jnp.asarray(ssym, r3_dtype))
    return dx, dly
