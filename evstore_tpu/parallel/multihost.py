"""Multi-host (DCN) initialization and data distribution.

Reference: extend_distributed.init_distributed autodetects
ccl/nccl/mpi/gloo and derives rank/size from MPI/torchrun env vars
(extend_distributed.py:65-151).  On TPU pods the equivalent is
jax.distributed.initialize — the TPU runtime knows the topology, so there
is no backend selection and no env-var spelunking; the mesh helpers below
lay the (data, model) axes out so the model axis stays inside a slice (ICI)
and the data axis crosses hosts (DCN), which is the bandwidth-correct
orientation for DLRM's exchange (SURVEY §2.4).

Multi-host runs cannot be simulated in-process; the driver validates the
SPMD path via dryrun_multichip on a virtual device mesh instead.  This
module is the thin layer that binds the same code to a real pod.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from evstore_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize the cross-host runtime (≙ init_distributed).  With no
    arguments, TPU pod environments self-configure.  Returns
    (process_index, process_count).

    NOTE: must run before anything touches the XLA backend — including
    jax.devices()/process_count() — so the guard here is try/except on the
    initialize call itself, never a backend query (a backend-touching guard
    makes explicit multi-process init impossible; caught by
    tests/test_multihost.py)."""
    if coordinator_address or num_processes:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            if "already" not in str(e):    # double-init: idempotent no-op
                raise
    else:
        try:
            jax.distributed.initialize()   # pod envs self-configure
        except Exception:
            pass                           # single process: stay local
    return jax.process_index(), jax.process_count()


def make_pod_mesh(n_model: Optional[int] = None) -> Mesh:
    """(data, model) mesh over ALL devices (across hosts), model axis packed
    within hosts so the row-exchange collectives ride ICI."""
    devs = jax.devices()
    per_host = len(jax.local_devices())
    if n_model is None:
        n_model = per_host
    if len(devs) % n_model != 0:
        raise ValueError(f"{len(devs)} devices not divisible by model axis "
                         f"{n_model}")
    # jax.devices() orders by process; reshaping keeps each model group
    # within one host when n_model divides per_host
    arr = np.asarray(devs).reshape(len(devs) // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def host_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[lo, hi) of the global batch this host should feed
    (≙ get_my_slice, extend_distributed.py:47-51).  With batch sharded on
    the data axis and the mesh laid out host-major, host h feeds the
    contiguous global slice h/H."""
    h, H = jax.process_index(), jax.process_count()
    per = global_batch // H
    lo = h * per
    hi = lo + per if h < H - 1 else global_batch
    return lo, hi


def make_global_batch(local_arrays, mesh: Mesh, specs):
    """Assemble per-host numpy shards into global jax.Arrays
    (jax.make_array_from_process_local_data)."""
    return jax.tree_util.tree_map(
        lambda a, s: jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(mesh, s), np.asarray(a)),
        local_arrays, specs,
        is_leaf=lambda x: isinstance(x, (np.ndarray,)))
