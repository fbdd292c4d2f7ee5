"""Pairwise feature interaction for DLRM.

Reference semantics: DLRM_Net.interact_features (dlrm_s_pytorch.py:483-516).
`dot`: stack the bottom-MLP output with the embedding vectors, compute the
batched Gram matrix, and keep the strictly-lower triangle (optionally the
diagonal too when `self_interaction`); concatenate with the dense vector.
`cat`: plain concatenation.

TPU notes: the Gram matrix is a [B, F, D] x [B, D, F] batched matmul that XLA
maps straight onto the MXU; the triangle extraction is a static gather that
XLA fuses with the matmul output.  A Pallas fused variant lives in
`evstore_tpu.ops.pallas_interaction` — both produce identical outputs and the
faster one is selected by the model via config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _tril_indices(num_features: int, self_interaction: bool):
    # cache numpy (never jnp: a jnp array created inside a jit trace would
    # leak a tracer into later traces); jnp.asarray at use site is free
    offset = 0 if self_interaction else -1
    return np.tril_indices(num_features, k=offset)


@functools.lru_cache(maxsize=None)
def _tril_select(num_features: int, self_interaction: bool):
    """[F*F, P] 0/1 selection matrix picking the lower triangle.

    The triangle extraction as a MATMUL instead of a gather: XLA lowers
    the advanced-index gather (and, worse, its backward SCATTER into
    [B, F, F]) as serialized per-element ops, measured +2.5 ms per
    B=32768 fwd+bwd on v5e (scripts/_inter_ab.py sweep: gather 9.8-10.0
    ms, selection-matmul 7.5 ms; flat-take 10.2, lane-batched gram 10.3).
    Each output column selects exactly ONE gram element (single 1 per
    column), so matmul-in-bf16 + f32 accumulate yields values identical
    to gather-then-cast; the backward is the transposed matmul."""
    li, lj = _tril_indices(num_features, self_interaction)
    s = np.zeros((num_features * num_features, len(li)), np.float32)
    s[li * num_features + lj, np.arange(len(li))] = 1.0
    return s


@functools.lru_cache(maxsize=None)
def _split_select(num_features: int, self_interaction: bool):
    """[1 + T + T*T, P] 0/1 selection over the SPLIT gram parts
    [x.x | x.ly (T) | ly-gram flat (T*T)], preserving the reference's
    tril column order.  Avoids concatenating x into a [B, F, D] feats
    array: the concat and its backward cost two ~1.6 ms relayout copies
    per B=65536 step on v5e (round-4 trace; scripts/ab_interaction_r4.py:
    fwd+bwd 15.8 -> 9.1 ms isolated)."""
    T = num_features - 1
    li, lj = _tril_indices(num_features, self_interaction)
    s = np.zeros((1 + T + T * T, len(li)), np.float32)
    for col, (i, j) in enumerate(zip(li, lj)):
        if i == 0 and j == 0:
            s[0, col] = 1.0                               # <x, x>
        elif j == 0:
            s[1 + (i - 1), col] = 1.0                     # <ly_{i-1}, x>
        else:
            s[1 + T + (i - 1) * T + (j - 1), col] = 1.0   # <ly_i, ly_j>
    return s


def dot_interaction(x: jnp.ndarray, ly: jnp.ndarray,
                    self_interaction: bool = False) -> jnp.ndarray:
    """x: [B, D] dense features; ly: [B, T, D] embedding vectors.

    Returns [B, D + P] with P = (T+1)T/2 (+T+1 if self_interaction).

    The Gram products are computed in SPLIT form (x.x, x.ly, ly-gram)
    instead of over a concatenated [B, F, D] feats array — the same
    pairwise dots (dlrm_s_pytorch.py:483-516) without the feats concat,
    whose forward + backward were two ~1.6 ms relayout copies per step
    at B=65536 (round-4 trace; see _split_select).
    """
    B, D = x.shape
    T = ly.shape[1]
    F = T + 1
    # precision=HIGHEST for f32 inputs: the interaction is quality-critical
    # and tiny next to the MLPs (F*F*D MACs/sample), so don't let the MXU
    # demote f32 operands to bf16 (the default); matches the Pallas fused
    # kernel.  For bf16 inputs HIGHEST is semantically a no-op (operands
    # are already bf16, accumulation is f32 via preferred_element_type)
    # but steers XLA into a slower convert-heavy convolution lowering —
    # keep the default there.
    hp = (jax.lax.Precision.HIGHEST
          if x.dtype == jnp.float32 else None)
    xly = jnp.einsum("bd,btd->bt", x, ly,
                     preferred_element_type=jnp.float32,
                     precision=hp)                               # [B, T]
    gly = jnp.einsum("btd,bsd->bts", ly, ly,
                     preferred_element_type=jnp.float32,
                     precision=hp)                               # [B, T, T]
    # f32 inputs need HIGHEST in the selection too: the default MXU
    # precision truncates the f32 gram to bf16 *before* the 0/1 selection,
    # silently rounding the output (caught by the compiled Pallas parity
    # test).  HIGHEST's bf16 operand split is exact for f32, and each
    # output column sums exactly one gram element, so the selection stays
    # value-identical to the gather.  bf16 compute keeps the fast default.
    sel_prec = (jax.lax.Precision.HIGHEST
                if x.dtype == jnp.float32 else None)
    S = _split_select(F, self_interaction)                   # [1+T+T*T, P]
    Sx = jnp.asarray(S[1:1 + T], x.dtype)                    # [T, P]
    Sg = jnp.asarray(S[1 + T:].reshape(T, T, len(S[0])), x.dtype)
    # selection as 3D einsums (no explicit [B, T*T] reshape: its backward
    # materialized a 1.6 ms relayout copy of the gly grad per step at
    # B=65536 — round-4 trace); each flat column receives exactly one
    # nonzero source across the summed matmuls, so this stays exact
    flat = (jnp.einsum("bt,tp->bp", xly.astype(x.dtype), Sx,
                       preferred_element_type=jnp.float32,
                       precision=sel_prec)
            + jnp.einsum("bts,tsp->bp", gly.astype(x.dtype), Sg,
                         preferred_element_type=jnp.float32,
                         precision=sel_prec))
    if self_interaction:
        xx = jnp.einsum("bd,bd->b", x, x,
                        preferred_element_type=jnp.float32,
                        precision=hp)                            # [B]
        Sxx = jnp.asarray(S[0], jnp.float32)                     # [P]
        flat = flat + xx[:, None] * Sxx[None, :]
    return jnp.concatenate([x, flat.astype(x.dtype)], axis=1)


def cat_interaction(x: jnp.ndarray, ly: jnp.ndarray,
                    self_interaction: bool = False) -> jnp.ndarray:
    del self_interaction
    B = x.shape[0]
    return jnp.concatenate([x, ly.reshape(B, -1)], axis=1)
