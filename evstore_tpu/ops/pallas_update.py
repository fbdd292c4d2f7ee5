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
coalesce by matmul summation (no unique/segment_sum needed).  The kernel
is a PURE LINEAR scatter-subtract (table -= scatter(rows, vals)); the
rwsadagrad state math runs in XLA on compact [B] / flat [N] operands with
per-entry pre-scaling (see rwsadagrad_row_update_pallas) — a [N, 1] state
block inside the kernel would be lane-padded x128 in HBM (~1 GB/step of
state traffic per 1M-row table; measured +1.5 ms vs the table-only sweep).

Measured (fenced+slope, 1x v5e, B=32768): 5x1M-row bf16 tables update in
21.9 ms vs 65.7 ms for the XLA rep-trick lowering in the same isolated
program shape (3.0x at Precision.HIGHEST — exactness-equivalent; 15.0 ms
with default MXU passes that bf16-round the values ~1%); in the FULL
train step XLA fuses the take-expansion
into the update pass and reaches ~14 ms effective, so end-to-end the
kernel is parity-minus-barrier-costs (52.1 vs 49.1 ms step) and stays
opt-in (ESV_PALLAS_SWEEP=1).  Full postmortem: EXPERIMENTS §17.

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


def _sub_sweep_kernel(starts_ref, table_ref, gc_hbm, rows_hbm,
                      table_out, gtile, gcbuf, rowbuf, gsems, rsems,
                      *, tb, d):
    """table_out = table - scatter(rows, vals): the pure linear sweep.

    All optimizer state math happens in XLA on compact/flat operands (see
    rwsadagrad_row_update_pallas) — a [N, 1] state input here would be
    lane-padded x128 in HBM, costing ~1 GB/step of state traffic per
    1M-row table (measured: the empty sweep WITH state cost 4.9 ms; the
    table-only sweep is the bandwidth floor)."""
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
        # HIGHEST: the MXU's default f32 path multiplies via bf16 passes,
        # which rounds the update values (~1% error vs the XLA scatter);
        # full-precision passes keep the kernel exactness-equivalent
        gtile[...] = gtile[...] + jnp.dot(
            onehot, g, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return carry

    lax.fori_loop(0, nch, chunk_body, 0)

    table_out[...] = (table_ref[...].astype(jnp.float32) - gtile[...]
                      ).astype(table_out.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret"))
def scatter_sub_sweep(table, rows2d, gc_pad, starts, *,
                      tile_rows: int = 4096, interpret: bool = False):
    """new_table = table - scatter_add(rows, vals) over SORTED raw entries.

    table [N, D] (f32/bf16), rows2d [nchunks, CHUNK] i32 of ascending row
    ids (out-of-range/PAD entries inert), gc_pad [nchunks*CHUNK, GC_LANES]
    f32 with the (pre-scaled) update values aligned to rows2d's flattening
    in [:, :D], starts [n_tiles+1] i32 (searchsorted tile boundaries into
    the flattened rows).
    """
    n, d = table.shape
    tb = tile_rows
    n_tiles = pl.cdiv(n, tb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # starts
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, starts: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),           # gc (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),           # rows (HBM)
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i, starts: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tb, d), jnp.float32),               # gtile
            pltpu.VMEM((NBUF, CHUNK, GC_LANES), jnp.float32),
            pltpu.VMEM((NBUF, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    kernel = functools.partial(_sub_sweep_kernel, tb=tb, d=d)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        interpret=interpret,
    )(starts, table, gc_pad, rows2d)


def rwsadagrad_row_update_pallas(state, table, ids, grads, lr, *,
                                 tile_rows: int = 4096,
                                 interpret: bool = False):
    """Drop-in for optim.row_update's rwsadagrad path on big tables.

    ids [B] raw row ids (duplicates fine; PAD_ROW/out-of-range entries are
    inert), grads [B, D] per-sample row grads.  Returns
    (new_state, new_table) in row_update's order.

    Split of labor (all XLA operands are compact [B]-domain or flat [N]):
      XLA   argsort ids; coalesce duplicates by sorted-segment sum; state
            increment via a D=1 scatter-add into the FLAT [N] accumulator
            (1D arrays aren't lane-padded; measured cheap); per-entry
            scale = lr / (sqrt(new_state_row) + eps) — LINEAR in each raw
            entry, so scaling entries then summing in the kernel is exact:
            lr * (sum g_i) / denom == sum (lr * g_i / denom).
      Pallas  one bandwidth sweep over the table subtracting the scatter
            of the pre-scaled entries (scatter_sub_sweep).
    """
    n, d = table.shape
    b = ids.shape[0]
    g = grads.astype(jnp.float32)
    # out-of-range ids sort to the end; searchsorted excludes them.  NBUF
    # slack chunks guard the double-buffer prefetch beyond the last chunk.
    order = jnp.argsort(ids)
    rows_sorted = jnp.take(ids, order).astype(jnp.int32)
    g_sorted = jnp.take(g, order, axis=0)

    # sorted-segment coalesce: Gc[k] = summed grads of the k-th segment
    first = jnp.concatenate([jnp.ones((1,), bool),
                             rows_sorted[1:] != rows_sorted[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1               # [B]
    Gc = jax.ops.segment_sum(g_sorted, seg, num_segments=b,
                             indices_are_sorted=True)           # [B, D]
    valid = rows_sorted < n                                     # PAD inert
    seg_row = jnp.full((b,), jnp.iinfo(jnp.int32).max, jnp.int32
                       ).at[seg].min(jnp.where(valid, rows_sorted,
                                               jnp.iinfo(jnp.int32).max),
                                     mode="drop")               # [B]
    inc = jnp.mean(Gc * Gc, axis=1)                             # [B]
    seg_valid = seg_row < n
    inc = jnp.where(seg_valid, inc, 0.0)
    # rwsadagrad state: momentum[row] += mean(G_row^2)
    new_state = state.at[seg_row].add(inc, mode="drop")
    st_rows = state.at[seg_row].get(mode="fill", fill_value=0.0) + inc
    denom_seg = jnp.sqrt(st_rows) + EPS                         # [B] per-seg
    scale = jnp.take(lr / denom_seg, seg)                       # [B] per-entry
    g_scaled = g_sorted * scale[:, None]

    nch = -(-b // CHUNK) + NBUF + 1
    rows_pad = jnp.full((nch * CHUNK,), jnp.iinfo(jnp.int32).max, jnp.int32)
    rows_pad = lax.dynamic_update_slice(rows_pad, rows_sorted, (0,))
    gc_pad = jnp.zeros((nch * CHUNK, GC_LANES), jnp.float32)
    gc_pad = lax.dynamic_update_slice(gc_pad, g_scaled, (0, 0))
    n_tiles = -(-n // tile_rows)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_rows
    starts = jnp.searchsorted(rows_sorted, bounds).astype(jnp.int32)
    new_table = scatter_sub_sweep(
        table, rows_pad.reshape(nch, CHUNK), gc_pad, starts,
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
