"""Pallas fused rwsadagrad sparse-update kernel (the scatter-cliff fix).

Problem (measured, 1x v5e, scripts/profile_update.py): the B=32768 train
step's update cost is entirely the 5 large (1M-row) tables; XLA lowers
both the row scatter and the [N]-row position-map take as SERIALIZED
per-row ops (~135 ns/row scatter, ~4-13 ms per 1M-row table), 10-30x off
HBM bandwidth — every scatter/gather-shaped lowering of the sparse update
is serialization-bound.

Design: ONE blocked sweep over the table at HBM bandwidth, with the
scatter expressed as MXU matmuls.  Updates are sorted by row id on the XLA
side (argsort + payload gather — VMEM-sized operands, cheap).  The
kernel's grid walks table tiles [TB, D]; each tile streams its contiguous
slice of the sorted update list HBM->VMEM (double-buffered CHUNK-row DMAs)
and accumulates

    gtile += onehot(rows_chunk - tile_base) @ g_chunk      (MXU)

The one-hot compare self-masks: rows belonging to neighboring tiles (or
PAD) produce no match, so boundary chunks shared by two tiles are simply
processed by both — no per-row control flow anywhere.  Duplicate ids
coalesce by matmul summation (no unique/segment_sum needed).  Then the
whole rwsadagrad step runs vectorized on the tile:

    G        = sum of grads per row (0 for untouched rows)
    state   += mean(G^2, axis=1)            [row-wise accumulator,
                                             optim/rwsadagrad.py:109-113]
    table   -= lr * G / (sqrt(state) + eps)

Traffic = table r/w + state r/w + the update stream, all sequential; the
matmul flops (~#chunks * TB*CHUNK*D) are noise on the MXU.

Reference semantics: optim/rwsadagrad.py:109-113 (sparse path); exactness
vs optim.row_update's other lowerings is cross-checked in
tests/test_pallas_update.py (sum order differs -> fp tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10
GC_LANES = 128          # update rows padded to one lane tile for aligned DMA
CHUNK = 128             # update-stream DMA granularity (rows)
NBUF = 2                # double buffer


def _rws_kernel(starts_ref, lr_ref, table_ref, state_ref, gc_hbm, rows_hbm,
                table_out, state_out, gtile, gcbuf, rowbuf, gsems, rsems,
                *, tb, d):
    i = pl.program_id(0)
    base = i * tb
    lo = starts_ref[i]
    hi = starts_ref[i + 1]

    gtile[...] = jnp.zeros(gtile.shape, gtile.dtype)

    c0 = lo // CHUNK
    nch = (hi + (CHUNK - 1)) // CHUNK - c0           # chunks covering [lo,hi)

    def gdma(c):
        return pltpu.make_async_copy(
            gc_hbm.at[pl.ds((c0 + c) * CHUNK, CHUNK), :],
            gcbuf.at[lax.rem(c, NBUF)],
            gsems.at[lax.rem(c, NBUF)])

    def rdma(c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(c0 + c, 1), :],
            rowbuf.at[lax.rem(c, NBUF)],
            rsems.at[lax.rem(c, NBUF)])

    @pl.when(nch > 0)
    def _prime():
        gdma(0).start()
        rdma(0).start()

    iota = lax.broadcasted_iota(jnp.int32, (tb, CHUNK), 0)   # row-within-tile

    def chunk_body(c, carry):
        @pl.when(c + 1 < nch)
        def _next():
            gdma(c + 1).start()
            rdma(c + 1).start()
        gdma(c).wait()
        rdma(c).wait()
        local = rowbuf[lax.rem(c, NBUF)] - base              # [1, CHUNK]
        onehot = (iota == local).astype(jnp.float32)         # [TB, CHUNK]
        g = gcbuf[lax.rem(c, NBUF)][:, :d]                   # [CHUNK, D]
        gtile[...] = gtile[...] + jnp.dot(
            onehot, g, preferred_element_type=jnp.float32)
        return carry

    lax.fori_loop(0, nch, chunk_body, 0)

    g = gtile[...]                                    # [TB, D] f32
    st = state_ref[...]                               # [TB, 1] f32
    new_st = st + jnp.mean(g * g, axis=1, keepdims=True)
    upd = (lr_ref[0] * g) / (jnp.sqrt(new_st) + EPS)
    table_out[...] = (table_ref[...].astype(jnp.float32) - upd
                      ).astype(table_out.dtype)
    state_out[...] = new_st


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret"))
def rwsadagrad_apply_sorted(table, state, rows2d, gc_pad, starts, lr, *,
                            tile_rows: int = 2048, interpret: bool = False):
    """Fused apply over SORTED raw updates.

    table [N, D] (f32/bf16), state [N] f32, rows2d [nchunks, CHUNK] i32 of
    ascending row ids (out-of-range/PAD entries inert), gc_pad
    [nchunks*CHUNK, GC_LANES] f32 with grads aligned to rows2d's
    flattening in [:, :D], starts [n_tiles+1] i32 (searchsorted tile
    boundaries into the flattened rows), lr scalar.
    Returns (new_table, new_state).
    """
    n, d = table.shape
    tb = tile_rows
    n_tiles = pl.cdiv(n, tb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # starts
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # lr [1]
            pl.BlockSpec((tb, d), lambda i, starts: (i, 0)),
            pl.BlockSpec((tb, 1), lambda i, starts: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),           # gc (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),           # rows (HBM)
        ],
        out_specs=[
            pl.BlockSpec((tb, d), lambda i, starts: (i, 0)),
            pl.BlockSpec((tb, 1), lambda i, starts: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, d), jnp.float32),               # gtile
            pltpu.VMEM((NBUF, CHUNK, GC_LANES), jnp.float32),
            pltpu.VMEM((NBUF, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    kernel = functools.partial(_rws_kernel, tb=tb, d=d)
    new_table, new_state2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, d), table.dtype),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)],
        interpret=interpret,
    )(starts,
      jnp.reshape(lr, (1,)).astype(jnp.float32),
      table, state.reshape(n, 1).astype(jnp.float32), gc_pad, rows2d)
    return new_table, new_state2.reshape(n)


def rwsadagrad_row_update_pallas(state, table, ids, grads, lr, *,
                                 tile_rows: int = 2048,
                                 interpret: bool = False):
    """Drop-in for optim.row_update's rwsadagrad path on big tables.

    ids [B] raw row ids (duplicates fine; PAD_ROW/out-of-range entries are
    inert), grads [B, D] per-sample row grads.  XLA-side prep = argsort +
    payload gather + lane pad (all VMEM-sized operands), then one kernel
    sweep.  Returns (new_state, new_table) in row_update's order.
    """
    n, d = table.shape
    b = ids.shape[0]
    g = grads.astype(jnp.float32)
    # out-of-range ids sort to the end; searchsorted excludes them.  NBUF
    # slack chunks guard the double-buffer prefetch beyond the last chunk.
    order = jnp.argsort(ids)
    rows_sorted = jnp.take(ids, order)
    g_sorted = jnp.take(g, order, axis=0)
    nch = -(-b // CHUNK) + NBUF + 1
    rows_pad = jnp.full((nch * CHUNK,), jnp.iinfo(jnp.int32).max, jnp.int32)
    rows_pad = lax.dynamic_update_slice(rows_pad,
                                        rows_sorted.astype(jnp.int32), (0,))
    gc_pad = jnp.zeros((nch * CHUNK, GC_LANES), jnp.float32)
    gc_pad = lax.dynamic_update_slice(gc_pad, g_sorted, (0, 0))
    n_tiles = -(-n // tile_rows)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_rows
    starts = jnp.searchsorted(rows_sorted, bounds).astype(jnp.int32)
    new_table, new_state = rwsadagrad_apply_sorted(
        table, state, rows_pad.reshape(nch, CHUNK), gc_pad, starts, lr,
        tile_rows=tile_rows, interpret=interpret)
    return new_state, new_table


# ------------------------------------------------------- jnp reference

def rwsadagrad_apply_sorted_ref(table, state, rows, grads, lr):
    """Reference semantics (optim/rwsadagrad.py:109-113) on raw ids."""
    n, d = table.shape
    G = jnp.zeros((n, d), jnp.float32).at[rows].add(
        grads.astype(jnp.float32), mode="drop")
    new_state = state + jnp.mean(G * G, axis=1)
    upd = lr * G / (jnp.sqrt(new_state) + EPS)[:, None]
    return (table.astype(jnp.float32) - upd).astype(table.dtype), new_state
