"""Model export for serving.

Reference: --save-onnx exports the torch model to ONNX
(dlrm_s_pytorch.py:1863-1878); the TPU-native equivalent is jax.export
(StableHLO), which any XLA-bearing runtime (TF serving via XLA, IREE,
another JAX process) can load.  Also exports a weight-truncation tool
(misc 'dissectingmodel.py': keep the first k rows of each table).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import DLRMConfig
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward


def export_stablehlo(params: DLRMParams, cfg: DLRMConfig, batch_size: int,
                     out_path: str) -> str:
    """Serialize the jitted forward (params baked in) as StableHLO bytes."""
    from jax import export as jexport

    def fwd(dense_x, idx):
        return jax.nn.sigmoid(dlrm_forward(params, dense_x, idx, cfg))

    dense_spec = jax.ShapeDtypeStruct((batch_size, cfg.num_dense_features),
                                      jnp.float32)
    idx_spec = jax.ShapeDtypeStruct((batch_size, cfg.num_tables), jnp.int32)
    exported = jexport.export(jax.jit(fwd))(dense_spec, idx_spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_exported(path: str):
    """Deserialize and return a callable(dense_x, idx) -> scores."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda dense_x, idx: exported.call(dense_x, idx)


def truncate_tables(params: DLRMParams, keep_rows: int) -> DLRMParams:
    """Keep only the first `keep_rows` rows of each plain table
    (misc dissectingmodel.py's weight truncation)."""
    new_sparse = {}
    for name, p in params.sparse.items():
        if "kind_plain" in p:
            q = dict(p)
            q["kind_plain"] = p["kind_plain"][:keep_rows]
            if "pool_w" in p:
                q["pool_w"] = p["pool_w"][:keep_rows]
            new_sparse[name] = q
        else:
            new_sparse[name] = p
    return DLRMParams(dense=params.dense, sparse=new_sparse)
