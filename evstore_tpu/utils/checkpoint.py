"""Checkpoint/resume and the EV-table export/import handoff.

Reference: torch.save of {state_dict, opt state, epoch, iter, losses,
metrics} on every new-best eval (dlrm_s_pytorch.py:1755-1777); resume
restores optimizer state and fast-forwards the loader via
skip_upto_epoch/skip_upto_batch (:1447-1504,1590,1605).  Separately the
trained embedding tables are exported per-table ("EV tables",
:1780-1796) — that export is the handoff to the storage/cache tier — and can
be re-injected into a model (evstore_utils.load_new_ev_table:13-29).

TPU-native: orbax for the model/optimizer pytrees; EV tables export to the
binary format the storage backends and native engine read directly
(cache/storage.py write_ev_tables_binary), with CSV kept for reference-format
compatibility.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from evstore_tpu.models.dlrm import DLRMParams
from evstore_tpu.train.optim import OptState


def save_checkpoint(ckpt_dir: str, step: int, params: DLRMParams,
                    opt_state: OptState, extra: Optional[dict] = None) -> str:
    """Save a full training state; returns the checkpoint path."""
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    state = {"params": params._asdict(), "opt": opt_state._asdict()}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, f"step_{step}.meta.json"), "w") as f:
        json.dump({"step": step, "extra": extra or {}}, f)
    return path


def restore_checkpoint(ckpt_dir: str, step: int, params: DLRMParams,
                       opt_state: OptState
                       ) -> Tuple[DLRMParams, OptState, dict]:
    """Restore into the given (abstract or concrete) state templates."""
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    template = {"params": params._asdict(), "opt": opt_state._asdict()}
    state = ckptr.restore(path, template)
    with open(os.path.join(ckpt_dir, f"step_{step}.meta.json")) as f:
        meta = json.load(f)
    return (DLRMParams(**state["params"]), OptState(**state["opt"]),
            meta.get("extra", {}))


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name.endswith(".meta.json"):
            steps.append(int(name[len("step_"):-len(".meta.json")]))
    return max(steps) if steps else None


# --------------------------------------------------- quantized inference

def quantize_embeddings(params: DLRMParams, bits: int) -> DLRMParams:
    """Quantize plain embedding tables through the EV codec for inference
    (reference --quantize-embedding-with-bit, dlrm_s_pytorch.py:1025-1028,
    quantization at :1515-1527).  Tables are stored encoded+decoded — the
    model itself stays fp32, matching the reference's accuracy-impact
    testing path (u_char_to_float CSVs)."""
    import jax.numpy as jnp
    from evstore_tpu.ops import quant as qlib
    new_sparse = {}
    for name, p in params.sparse.items():
        if "kind_plain" in p:
            q = dict(p)
            enc = qlib.quantize(p["kind_plain"].astype(jnp.float32), bits)
            q["kind_plain"] = qlib.dequantize(enc, bits).astype(
                p["kind_plain"].dtype)
            new_sparse[name] = q
        else:
            new_sparse[name] = p
    return DLRMParams(dense=params.dense, sparse=new_sparse)


def quantize_mlps(params: DLRMParams, bits: int = 8) -> DLRMParams:
    """Post-training int8 symmetric quantization of MLP weights
    (reference --quantize-mlp-with-bit, torch.quantization path
    dlrm_s_pytorch.py:1515-1527): per-tensor scale, dequantized storage."""
    import jax.numpy as jnp
    if bits != 8:
        raise ValueError("mlp quantization supports 8 bits")

    def q(w):
        scale = jnp.max(jnp.abs(w)) / 127.0
        return (jnp.round(w / scale).clip(-127, 127) * scale).astype(w.dtype)

    def walk(tree):
        return {k: ({"w": q(v["w"]), "b": v["b"]} if isinstance(v, dict)
                    and "w" in v else walk(v)) for k, v in tree.items()}

    return DLRMParams(dense=walk(params.dense), sparse=params.sparse)


# ------------------------------------------------------- EV-table handoff

def export_ev_tables(params: DLRMParams, out_dir: str,
                     precision: int = 32, also_csv: bool = False,
                     table_sizes=None) -> list:
    """Export trained embedding tables for the storage/cache tier
    (dlrm_s_pytorch.py:1780-1796 exports CSVs; we default to the binary
    format the backends mmap/pread directly).  `table_sizes` clips mesh
    padding rows (shard_dlrm_params pads tables to the model-axis size)."""
    from evstore_tpu.cache.storage import write_ev_tables_binary
    tables = []
    for t in range(len(params.sparse)):
        p = params.sparse[f"table_{t}"]
        if "kind_plain" not in p:
            raise ValueError("EV export requires plain tables (qr/md tables "
                             "are factorized and have no row-wise EVs)")
        tab = np.asarray(p["kind_plain"])
        if table_sizes is not None:
            tab = tab[:table_sizes[t]]
        tables.append(tab)
    paths = write_ev_tables_binary(tables, out_dir, precision)
    if also_csv:
        for t, tab in enumerate(tables):
            np.savetxt(os.path.join(out_dir, f"ev-table-{t + 1}.csv"),
                       tab, delimiter=",")
    return paths


def load_ev_tables_into_params(params: DLRMParams, ev_dir: str,
                               precision: int = 32) -> DLRMParams:
    """Swap embedding weights from exported EV tables
    (evstore_utils.load_new_ev_table:13-29)."""
    import jax.numpy as jnp
    from evstore_tpu.cache.storage import _decode_rows, row_nbytes
    new_sparse = dict(params.sparse)
    for t in range(len(params.sparse)):
        tab = params.sparse[f"table_{t}"]["kind_plain"]
        n, d = tab.shape
        nb = row_nbytes(precision, d)
        raw = np.fromfile(os.path.join(ev_dir, f"ev-table-{t + 1}.bin"),
                          dtype=np.uint8).reshape(n, nb)
        new_sparse[f"table_{t}"] = {
            "kind_plain": jnp.asarray(_decode_rows(raw, precision, d))}
    return DLRMParams(dense=params.dense, sparse=new_sparse)
