"""Pallas embedding-row gather kernels.

The hot op of DLRM inference/training is gathering B*T rows of dim D from
HBM-resident tables (reference: apply_emb's per-table EmbeddingBag loop,
dlrm_s_pytorch.py:416-459).  These kernels:

- `gather_rows`: table [N, D] stays in HBM (memory_space=ANY); row indices
  arrive via scalar prefetch so the kernel can program per-row DMAs
  HBM->VMEM; rows land directly in the output block.
- `gather_rows_dequant_int8`: same, but the table is uint8-encoded (the C1
  HBM cache at 8-bit precision); dequantization ((v/254)*2-1,
  reduce_precision.py:283) is fused into the copy-out, so the fp32 rows never
  exist in HBM — this is how the mixed-precision cache tier lives on-device.

Both have jnp reference implementations used as fallbacks on non-TPU
backends and in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_INFLIGHT = 16  # DMA window; semaphore memory (sflag) is tiny on TPU, so a
                 # per-row semaphore array is not an option — keep a small
                 # ring with up to N_INFLIGHT outstanding row copies.


def _gather_kernel(idx_ref, table_ref, out_ref, sems):
    """One grid step gathers TILE_B rows via a ring of in-flight DMAs."""
    i = pl.program_id(0)
    tile_b = out_ref.shape[0]

    def dma(j):
        row = idx_ref[i * tile_b + j]
        return pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                     sems.at[j % N_INFLIGHT])

    def body(j, carry):
        # retire the copy that used this semaphore slot before reusing it
        @pl.when(j >= N_INFLIGHT)
        def _retire():
            dma(j - N_INFLIGHT).wait()
        dma(j).start()
        return carry

    jax.lax.fori_loop(0, tile_b, body, 0)

    def drain(j, carry):
        dma(j).wait()
        return carry

    jax.lax.fori_loop(max(tile_b - N_INFLIGHT, 0), tile_b, drain, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, *, tile_b: int = 256,
                interpret: bool = False) -> jax.Array:
    """table [N, D] (HBM), idx [B] int32 -> [B, D].  B must divide by tile_b
    (pad idx with 0s upstream if needed)."""
    B = idx.shape[0]
    D = table.shape[1]
    tile_b = min(tile_b, B)
    if B % tile_b != 0:
        raise ValueError(f"B={B} not divisible by tile_b={tile_b}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // tile_b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_b, D), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_INFLIGHT,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), table)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gather_rows_dequant_int8(table_u8: jax.Array, idx: jax.Array, *,
                             tile_b: int = 256,
                             interpret: bool = False) -> jax.Array:
    """table_u8 [N, D] uint8 (HBM, 8-bit codec), idx [B] -> [B, D] fp32.

    Mosaic cannot DMA a single int8 row (sublane packing makes a [1, D] i8
    HBM slice unaddressable), so the rows travel through the fp32-style
    gather kernel as an int32 VIEW [N, D/4]; the byte unpack + dequant
    ((v/254)*2-1) run in XLA and fuse with downstream consumers.  D must be
    a multiple of 4 (pad the cache dim upstream otherwise)."""
    B = idx.shape[0]
    N, D = table_u8.shape
    if D % 4 != 0:
        raise ValueError(f"dim {D} must be a multiple of 4 for the packed "
                         "int8 gather")
    words = jax.lax.bitcast_convert_type(
        table_u8.reshape(N, D // 4, 4), jnp.int32)          # [N, D/4]
    if (D // 4) % 128 != 0 and not interpret:
        # Mosaic DMA row slices need 128-lane alignment; fall back to XLA
        return gather_rows_dequant_int8_ref(table_u8, idx)
    gathered = gather_rows(words, idx, tile_b=tile_b, interpret=interpret)
    shifts = jnp.asarray([0, 8, 16, 24], jnp.int32)         # little-endian
    bytes_ = (gathered[..., None] >> shifts) & 0xFF          # [B, D/4, 4]
    v = bytes_.reshape(B, D).astype(jnp.float32)
    return (v / 254.0) * 2.0 - 1.0


# -------------------------------------------------------- jnp references

def gather_rows_ref(table: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take(table, idx, axis=0)


def gather_rows_auto(table: jax.Array, idx: jax.Array,
                     tile_b: int = 256) -> jax.Array:
    """Pick the Pallas DMA gather when the row is lane-aligned (D % 128 == 0,
    4-byte dtype, TPU backend, B divisible by the tile) — it beats the XLA
    gather by ~5-10% on v5e — else the XLA gather."""
    D = table.shape[1]
    B = idx.shape[0]
    on_tpu = jax.devices()[0].platform != "cpu"
    if (on_tpu and D % 128 == 0 and table.dtype.itemsize == 4
            and B % min(tile_b, B) == 0):
        return gather_rows(table, idx, tile_b=tile_b)
    return gather_rows_ref(table, idx)


def gather_rows_dequant_int8_ref(table_u8: jax.Array, idx: jax.Array) -> jax.Array:
    v = jnp.take(table_u8, idx, axis=0).astype(jnp.float32)
    return (v / 254.0) * 2.0 - 1.0


# --------------------------------------------------- differentiable wrapper

@functools.lru_cache(maxsize=None)
def _gather_grad_for(shape, dtype_name: str):
    """custom_vjp gather specialized to a (static) table shape/dtype —
    residuals may only hold JAX values, so the statics close over."""
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def g(table, idx):
        return gather_rows_auto(table, idx)

    def fwd(table, idx):
        return gather_rows_auto(table, idx), idx

    def bwd(idx, ct):
        gt = jnp.zeros(shape, dtype).at[idx].add(ct.astype(dtype))
        return gt, None

    g.defvjp(fwd, bwd)
    return g


def gather_rows_grad(table: jax.Array, idx: jax.Array) -> jax.Array:
    """gather_rows_auto with a VJP (pallas_call has no transpose rule).

    The framework's train steps differentiate w.r.t. the *gathered rows*
    (train_loop.py), so this VJP normally never runs; it exists so
    dlrm_forward stays differentiable end-to-end when the Pallas gather is
    enabled (cotangent = scatter-add into a zeros table, the take-VJP)."""
    return _gather_grad_for(tuple(table.shape), str(table.dtype))(table, idx)
