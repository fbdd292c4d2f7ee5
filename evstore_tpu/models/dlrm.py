"""DLRM model core as a pure-pytree functional module.

Reference: DLRM_Net (dlrm_s_pytorch.py:206-731).  The forward is
bottom-MLP(dense) -> embedding lookup(sparse) -> pairwise interaction ->
top-MLP -> sigmoid, with BCE/MSE/weighted-BCE loss
(loss setup :297-312, forward :518-611, loss wrap :150-167).

TPU-first: the whole step is one pure function over a params pytree; dense
math runs in `compute_dtype` (bfloat16 recommended — MXU native) with fp32
params and fp32 loss.  Batch and shapes are static so XLA compiles a single
fused program.  `dlrm_forward` takes pre-looked-up embedding rows optionally,
which is how the cache tier and the sharded all-to-all path splice into the
same model math (the reference does the same via apply_emb_evstore,
dlrm_s_pytorch_C1.py:227).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import DLRMConfig
from evstore_tpu.models.embedding import init_sparse_arch, sparse_arch_lookup
from evstore_tpu.ops.interaction import cat_interaction, dot_interaction


class DLRMParams(NamedTuple):
    """Dense (MLP) params and sparse (embedding) params are kept separate so
    the training loop can apply dense-vs-rowwise-sparse optimizer updates and
    different shardings (DP replicate vs row-shard) to each."""
    dense: Dict
    sparse: Dict


def _init_mlp(key: jax.Array, dims, dtype) -> Dict:
    """Linear layers with the reference's init: W ~ N(0, sqrt(2/(m+n))),
    b ~ N(0, sqrt(1/n)) (dlrm_s_pytorch.py:215-240)."""
    layers = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        m, n = dims[i], dims[i + 1]
        kw, kb = jax.random.split(k)
        std_w = float(np.sqrt(2.0 / (m + n)))
        std_b = float(np.sqrt(1.0 / n))
        layers[f"layer_{i}"] = {
            "w": (std_w * jax.random.normal(kw, (m, n))).astype(dtype),
            "b": (std_b * jax.random.normal(kb, (n,))).astype(dtype),
        }
    return layers


def _apply_mlp(layers: Dict, x: jnp.ndarray, *, last_linear: bool,
               compute_dtype) -> jnp.ndarray:
    n = len(layers)
    h = x.astype(compute_dtype)
    for i in range(n):
        lyr = layers[f"layer_{i}"]
        h = jnp.dot(h, lyr["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = (h + lyr["b"].astype(jnp.float32))
        if i == n - 1 and last_linear:
            break  # logits; sigmoid applied in loss/prediction
        h = jax.nn.relu(h).astype(compute_dtype)
    return h


def init_dlrm(key: jax.Array, cfg: DLRMConfig) -> DLRMParams:
    cfg.validate()
    kb, kt, ke = jax.random.split(key, 3)
    dtype = jnp.dtype(cfg.param_dtype)
    dense = {
        "bot": _init_mlp(kb, cfg.mlp_bot, dtype),
        "top": _init_mlp(kt, cfg.mlp_top, dtype),
    }
    sparse = init_sparse_arch(ke, cfg)
    return DLRMParams(dense=dense, sparse=sparse)


def bottom_mlp(dense_params: Dict, x: jnp.ndarray, cfg: DLRMConfig) -> jnp.ndarray:
    cdt = jnp.dtype(cfg.compute_dtype)
    return _apply_mlp(dense_params["bot"], x, last_linear=False,
                      compute_dtype=cdt).astype(cdt)


def interact(x: jnp.ndarray, ly: jnp.ndarray, cfg: DLRMConfig) -> jnp.ndarray:
    if cfg.interaction_op == "dot":
        B = x.shape[0]
        if (cfg.use_pallas_interaction and jax.default_backend() == "tpu"
                and B % 128 == 0 and x.shape[1] <= 64):
            # sample-blocked fused kernel: G samples' feature matrices ride
            # one MXU operand (~2.2x isolated fwd+bwd on v5e at B=65536,
            # scripts/ab_gram_r5.py); falls back to the XLA split-gram form
            # for odd batch shapes / non-TPU backends.  Narrow dims only:
            # the kernel exists to fix MXU tile padding on TINY per-sample
            # operands (27x36), and at D=128 (MLPerf recipe, F=22) the
            # unrolled Mosaic build takes ~353 s vs 29 s for the whole XLA
            # step with nothing to win back (EXPERIMENTS §30)
            from evstore_tpu.ops.pallas_interaction import (
                dot_interaction_blocked)
            return dot_interaction_blocked(x, ly, cfg.interaction_itself,
                                           tile_b=128, group=4)
        return dot_interaction(x, ly, cfg.interaction_itself)
    return cat_interaction(x, ly)


def top_mlp(dense_params: Dict, z: jnp.ndarray, cfg: DLRMConfig) -> jnp.ndarray:
    cdt = jnp.dtype(cfg.compute_dtype)
    logits = _apply_mlp(dense_params["top"], z, last_linear=True,
                        compute_dtype=cdt)
    return logits[..., 0].astype(jnp.float32)  # [B]


def dlrm_forward(params: DLRMParams, dense_x: jnp.ndarray, idx: jnp.ndarray,
                 cfg: DLRMConfig,
                 emb_rows: Optional[jnp.ndarray] = None,
                 bag_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Returns logits [B].

    dense_x: [B, num_dense] fp32 (already log1p-transformed, data_utils.py
    semantics); idx: [B, T] int32 one-hot or [B, T, L] multi-hot bags
    (sum-pooled, optional bag_weights [B, T, L] ≙ EmbeddingBag
    per_sample_weights, dlrm_s_pytorch.py:407-459); emb_rows: optional
    pre-fetched [B, T, D] rows (cache tier / sharded exchange output) that
    bypass the local lookup.
    """
    x = bottom_mlp(params.dense, dense_x, cfg)
    if emb_rows is None:
        emb_rows = sparse_arch_lookup(params.sparse, idx, cfg, bag_weights)
    ly = emb_rows.astype(x.dtype)
    z = interact(x, ly, cfg)
    return top_mlp(params.dense, z, cfg)


def predict(params: DLRMParams, dense_x, idx, cfg, emb_rows=None,
            bag_weights=None) -> jnp.ndarray:
    """Click probability in [0,1], with the reference's loss_threshold clamp
    (dlrm_s_pytorch.py:605-611)."""
    p = jax.nn.sigmoid(dlrm_forward(params, dense_x, idx, cfg, emb_rows,
                                    bag_weights))
    if cfg.loss_threshold > 0.0:
        p = jnp.clip(p, cfg.loss_threshold, 1.0 - cfg.loss_threshold)
    return p


def dlrm_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              loss_function: str = "bce",
              loss_weights=(1.0, 1.0)) -> jnp.ndarray:
    """BCE (with logits for numerical stability — same math as the
    reference's sigmoid+nn.BCELoss), MSE, or weighted BCE
    (dlrm_s_pytorch.py:297-312,150-167)."""
    t = targets.astype(jnp.float32)
    if loss_function == "mse":
        p = jax.nn.sigmoid(logits)
        return jnp.mean((p - t) ** 2)
    # log-sigmoid BCE
    per = -(t * jax.nn.log_sigmoid(logits) + (1.0 - t) * jax.nn.log_sigmoid(-logits))
    if loss_function == "wbce":
        w = jnp.where(t > 0.5, loss_weights[1], loss_weights[0])
        return jnp.sum(w * per) / jnp.sum(w)
    return jnp.mean(per)
