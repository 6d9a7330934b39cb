"""Pallas TPU kernel: batched contiguous row-slice gather from a small table.

The engine's episode prefetch (e.g. BuildingEnv.batch_unroll) needs, for each
of B env instances, the contiguous slice ``table[start_b : start_b + L]`` of a
small exogenous table (rows = epochs, a handful of float32 columns). XLA's
gather pads the minor dimension to the 128-lane tile, so a (L, 4)-per-index
gather moves 32x the useful bytes (measured ~2.9 GB/s effective on v5e). This
kernel repacks the table so each VMEM row holds ``128 // C`` consecutive
epochs, keeps the WHOLE table resident in VMEM (these tables are ~1-2 MB), and
per env reads the aligned row span + realigns in-register with a static-shift
switch — every HBM byte moved is useful output.

Replaces the reference's per-step pandas/np indexing of weather/ambient
series (/root/reference/sustaingym/envs/building/env.py:243-263) at batch
scale; the XLA fallback (`_xla_slice_gather`) keeps CPU/debug paths working.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["episode_slice_gather", "hbm_slice_gather"]

_LANES = 128
# Max packed-table bytes we are willing to pin in VMEM alongside the output
# block (v5e/v5p have ~16 MB VMEM/core).
_MAX_TABLE_BYTES = 6 * 1024 * 1024


def _xla_slice_gather(table: jax.Array, starts: jax.Array, length: int
                      ) -> jax.Array:
    """Reference semantics: vmapped dynamic_slice (used off-TPU)."""
    c = table.shape[1]
    return jax.vmap(
        lambda e: jax.lax.dynamic_slice(
            table, (e, jnp.zeros((), e.dtype)), (length, c)))(starts)


def _kernel(starts_ref, table_ref, out_ref, *, chunk: int, nr: int, epr: int,
            cp: int, unroll: int):
    """Per grid step: gather ``chunk`` envs' slices out of the VMEM table.

    starts_ref: (smem_chunk,) int32 in SMEM — epoch starts; grid dim 1 walks
                it in ``chunk``-sized subchunks (s32 layout wants 1024-wide
                SMEM blocks, but a 1024-env VMEM output block would OOM).
    table_ref: (rows, 128) f32 in VMEM — whole packed table (row = epr epochs).
    out_ref:   (chunk, nr, 128) f32 in VMEM.

    The env loop is unrolled ``unroll``-wide: the per-env scalar chain
    (address computation, dynamic-slice setup) is the bottleneck, and
    unrolling lets the scalar core run ahead of the vector ops (~25%
    faster at 8 on v5e).
    """

    lane = jax.lax.broadcasted_iota(jnp.int32, (nr, _LANES), 1)
    sub = pl.program_id(1)

    def one(c):
        e = starts_ref[sub * chunk + c]
        base = e // epr
        r = e % epr
        span = table_ref[pl.ds(base, nr + 1), :]    # (nr+1, 128)
        left = span[:nr, :]
        right = span[1:, :]
        # result[:, l] = left[:, l+s] if l < 128-s else right[:, l+s-128]
        # == dynamic lane-roll by -s of left/right + lane-mask select (Mosaic
        # cannot relayout misaligned lane slices, but rolls are cheap)
        s = r * cp
        rl = pltpu.roll(left, shift=_LANES - s, axis=1)
        rr = pltpu.roll(right, shift=_LANES - s, axis=1)
        res = jnp.where(lane < _LANES - s, rl, rr)
        out_ref[pl.ds(c, 1)] = res.reshape(1, nr, _LANES)

    def body(ci, _):
        for g in range(unroll):
            one(ci * unroll + g)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _padded_cols(c: int) -> int:
    """Pads the column count to a power-of-two divisor of 128.

    Only defined for c <= 128 (wider tables take the XLA fallback); for
    c in (64, 128] the divisor is 128 itself.
    """
    if c > _LANES:
        raise ValueError(f"_padded_cols: {c} columns > {_LANES} lanes")
    cp = 1 << max(0, int(np.ceil(np.log2(max(c, 1)))))
    return min(cp, _LANES)


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def _pallas_slice_gather(table: jax.Array, starts: jax.Array, length: int,
                         interpret: bool = False) -> jax.Array:
    rows_in, c = table.shape
    cp = _padded_cols(c)
    epr = _LANES // cp                      # epochs per packed row
    # pad length so each env's output is whole 128-lane rows
    lp = int(np.ceil(length * cp / _LANES) * _LANES // cp)
    nr = (lp * cp) // _LANES                # packed rows per env

    # pack: epoch i lives at packed[i // epr, (i % epr) * cp : ... + c]
    rows_pad = int(np.ceil(rows_in / epr)) * epr
    pad_epochs = rows_pad - rows_in + (nr + 1) * epr
    tp = jnp.pad(table, ((0, pad_epochs), (0, cp - c)))
    packed = tp.reshape(-1, _LANES)         # (rows_packed, 128)

    b = starts.shape[0]
    # s32[B] operands get an XLA layout tiled at 1024: the SMEM block must be
    # 1024-wide. The VMEM output block is kept smaller (512 envs) via a
    # second grid dimension walking subchunks of the SMEM block. smem_chunk
    # is rounded UP to a multiple of chunk so subs covers every env (a
    # floored subs would silently leave the tail of the output unwritten).
    smem_chunk = min(1024, b)
    chunk = min(512, smem_chunk)
    smem_chunk = int(np.ceil(smem_chunk / chunk)) * chunk
    subs = smem_chunk // chunk
    bp = int(np.ceil(b / smem_chunk)) * smem_chunk
    starts_p = jnp.pad(starts.astype(jnp.int32), (0, bp - b))

    unroll = next(g for g in (8, 4, 2, 1) if chunk % g == 0)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, nr=nr, epr=epr, cp=cp,
                          unroll=unroll),
        grid=(bp // smem_chunk, subs),
        in_specs=[
            pl.BlockSpec((smem_chunk,), lambda i, j: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(packed.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, nr, _LANES),
                               lambda i, j: (i * subs + j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, nr, _LANES), table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=bp * nr * _LANES * 4 * 2),
        interpret=interpret,
    )(starts_p, packed)

    out = out.reshape(bp, nr * epr, cp)
    return out[:b, :length, :c]


def episode_slice_gather(table: jax.Array, starts: jax.Array, length: int
                         ) -> jax.Array:
    """``stack([table[e : e + length] for e in starts])`` — fast on TPU.

    table: (R, C) float array with C small (<= 128); R * 128 * 4 bytes after
    packing must fit VMEM, else falls back to XLA. starts: (B,) int32 row
    starts, caller guarantees ``starts + length <= R``. Returns (B, length, C).
    """
    rows, c = table.shape
    platform = jax.devices()[0].platform
    if platform != "tpu" or c > _LANES:
        # rows wider than the lane tile (e.g. EVCharging's 203-float step
        # rows) take the XLA path: a per-env contiguous dynamic_slice is
        # already tile-aligned, so the Pallas repacking buys nothing
        return _xla_slice_gather(table, starts, length)
    cp = _padded_cols(c)
    epr = _LANES // cp
    packed_bytes = int(np.ceil(rows / epr)) * _LANES * table.dtype.itemsize
    nr = int(np.ceil(length * cp / _LANES))
    # the VMEM output block holds at most 512 envs (see _pallas_slice_gather)
    out_block_bytes = 512 * nr * _LANES * table.dtype.itemsize
    if (packed_bytes > _MAX_TABLE_BYTES
            or out_block_bytes > 6 * 1024 * 1024):
        return _xla_slice_gather(table, starts, length)
    return _pallas_slice_gather(table, starts, length)


# ---------------------------------------------------------------------------
# HBM-resident variant: tables too large for VMEM (e.g. the EV step table,
# ~27 MB). Each env's slice is one contiguous multi-KB DMA straight from the
# HBM table into the output — no VMEM staging of the table, no lane padding.
# ---------------------------------------------------------------------------

def _hbm_kernel(starts_ref, table_ref, out_ref, sems, *, chunk: int,
                rpe: int, nrows: int, subs: int):
    """Grid step (i, j): issue ``chunk`` in-flight DMAs, one per env.

    starts_ref: (smem_chunk,) int32 SMEM; table_ref/out_ref live in ANY
    (HBM) and are indexed directly; sems: (chunk,) DMA semaphores.
    """
    j = pl.program_id(1)

    def get_dma(c):
        e = starts_ref[j * chunk + c]
        g = (pl.program_id(0) * subs + j) * chunk + c
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(e * rpe, nrows), :],
            out_ref.at[g],
            sems.at[c])

    for c in range(chunk):
        get_dma(c).start()
    for c in range(chunk):
        get_dma(c).wait()


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def _pallas_hbm_slice_gather(table: jax.Array, starts: jax.Array,
                             length: int, interpret: bool = False
                             ) -> jax.Array:
    rows_in, c = table.shape
    cp = int(np.ceil(c / _LANES)) * _LANES      # whole 128-lane rows/epoch
    rpe = cp // _LANES
    nrows = length * rpe
    tp = jnp.pad(table, ((0, length), (0, cp - c)))
    packed = tp.reshape(-1, _LANES)             # (rows * rpe, 128)

    b = starts.shape[0]
    smem_chunk = min(1024, b)
    chunk = min(64, smem_chunk)                 # DMAs in flight
    # round smem_chunk up to a chunk multiple so subs covers every env
    smem_chunk = int(np.ceil(smem_chunk / chunk)) * chunk
    subs = smem_chunk // chunk
    bp = int(np.ceil(b / smem_chunk)) * smem_chunk
    starts_p = jnp.pad(starts.astype(jnp.int32), (0, bp - b))

    out = pl.pallas_call(
        functools.partial(_hbm_kernel, chunk=chunk, rpe=rpe, nrows=nrows,
                          subs=subs),
        grid=(bp // smem_chunk, subs),
        in_specs=[
            pl.BlockSpec((smem_chunk,), lambda i, j: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bp, nrows, _LANES), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((chunk,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=bp * nrows * _LANES * 4 * 2),
        interpret=interpret,
    )(starts_p, packed)

    return out.reshape(bp, length, cp)[:b, :, :c]


def hbm_slice_gather(table: jax.Array, starts: jax.Array, length: int
                     ) -> jax.Array:
    """``stack([table[e : e + length] for e in starts])`` for LARGE tables.

    Unlike :func:`episode_slice_gather` the table stays in HBM; each env's
    slice moves as one contiguous DMA (rows are padded to whole 128-lane
    units, so amplification is ceil(C/128)*128/C instead of XLA's 128/C for
    narrow C). Use when the table exceeds the VMEM budget.
    """
    if jax.devices()[0].platform != "tpu":
        return _xla_slice_gather(table, starts, length)
    return _pallas_hbm_slice_gather(table, starts, length)
