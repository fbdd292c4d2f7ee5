"""Device mesh construction and sharding helpers.

The reference's distributed layer (extend_distributed.py) wires
NCCL/MPI/Gloo/oneCCL process groups with env-var rank discovery.  On TPU the
equivalent is a `jax.sharding.Mesh` over the slice: the "data" axis carries
batch data-parallelism (the reference's DDP, dlrm_s_pytorch.py:1370-1377) and
the "model" axis carries embedding-table sharding (create_emb's per-rank table
slices, :352-365).  XLA lowers the collectives onto ICI (intra-slice) and DCN
(multi-host) automatically from the mesh's device order; there is no backend
autodetect to do.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """2D (data, model) mesh.  Defaults: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = n, 1
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_rows_for_mesh(table: jax.Array, n_model: int) -> jax.Array:
    """Pad a [N, D] table with zero rows so N divides the model axis.  Padding
    rows are never produced by real indices and never updated (indices are
    range-checked upstream)."""
    n, d = table.shape
    n_pad = round_up(n, n_model) - n
    if n_pad == 0:
        return table
    import jax.numpy as jnp
    return jnp.concatenate([table, jnp.zeros((n_pad, d), table.dtype)], axis=0)
