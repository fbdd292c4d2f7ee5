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


def dot_interaction(x: jnp.ndarray, ly: jnp.ndarray,
                    self_interaction: bool = False) -> jnp.ndarray:
    """x: [B, D] dense features; ly: [B, T, D] embedding vectors.

    Returns [B, D + P] with P = (T+1)T/2 (+T+1 if self_interaction).
    """
    B, D = x.shape
    T = ly.shape[1]
    feats = jnp.concatenate([x[:, None, :], ly], axis=1)       # [B, F, D]
    # precision=HIGHEST: the interaction is quality-critical and tiny next
    # to the MLPs (F*F*D MACs/sample), so don't let the MXU demote the f32
    # operands to bf16 (the default); matches the Pallas fused kernel.
    gram = jnp.einsum("bfd,bgd->bfg", feats, feats,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)       # [B, F, F]
    li, lj = _tril_indices(T + 1, self_interaction)
    flat = gram[:, jnp.asarray(li), jnp.asarray(lj)].astype(x.dtype)  # [B, P]
    return jnp.concatenate([x, flat], axis=1)


def cat_interaction(x: jnp.ndarray, ly: jnp.ndarray,
                    self_interaction: bool = False) -> jnp.ndarray:
    del self_interaction
    B = x.shape[0]
    return jnp.concatenate([x, ly.reshape(B, -1)], axis=1)
