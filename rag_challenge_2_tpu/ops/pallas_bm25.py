"""Pallas posting-span gather: the BM25 kernel's HBM front-end.

Each query term owns a CONTIGUOUS span ``chunk_ids[start : start+W]`` of
the CSR arrays, but XLA only sees ``array[pos]`` with arbitrary indices and
lowers it as a random gather — measured 15.5 ms for B·T·W = 8·64·512 at
nnz = 67M on v5e, scaling to 118 ms at the default W=4096 cap.  This kernel
expresses what the access pattern really is:

1. one aligned contiguous DMA per (query, term) span, HBM → VMEM scratch
   (start rounded down to ALIGN elements so Mosaic can prove tile
   alignment; measured 1.8 ms for the same shapes — 8.7× the XLA gather);
2. in-kernel window extraction with dynamic ``pltpu.roll`` shifts
   (a flat roll decomposed into sublane roll + lane roll + carry select),
   so the unaligned indexing never leaves VMEM.

This is the Pallas win region the round-1 top-k experiments never found:
dense top-k is a streaming matmul XLA already schedules optimally
(ops/topk.py auto routes there), while span gather is an access pattern XLA
cannot recover from a gather op.

Requires the CSR arrays to be over-allocated (``SparseIndex.dma_pad ≥
dma_slack(W)``, guaranteed by index/build.py) so extended spans never read
out of bounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPANS_PER_PROGRAM = 8  # f32/i32 sublane tile — also overlaps 16 DMAs/program
ALIGN = 1024            # 8 sublanes × 128 lanes: dynamic row offset stays ÷8
_LANES = 128


def dma_slack(window: int) -> int:
    """Required CSR over-allocation beyond indptr[-1] for a given window."""
    w_eff = -(-window // _LANES) * _LANES
    return w_eff + ALIGN


def _extract_window(scr, row0, off, w_rows):
    """Flat window [off, off + w_rows·128) of the span at scratch row row0.

    The row part of the offset is a dynamic SUBLANE slice (Mosaic proves
    those; dynamic sublane *rotates* don't lower), the lane part is a
    dynamic lane roll plus a one-row carry select."""
    o_r = off // _LANES
    o_l = off % _LANES
    ext = scr[pl.ds(row0 + o_r, w_rows + 1), :]          # [w_rows+1, 128]
    b = pltpu.roll(ext, (_LANES - o_l) % _LANES, 1)      # left-roll by o_l
    lane = jax.lax.broadcasted_iota(jnp.int32, (w_rows, _LANES), 1)
    return jnp.where(lane < _LANES - o_l, b[:w_rows, :], b[1:, :])


def _make_kernel(r_rows: int, w_rows: int, n_arrays: int):
    P = _SPANS_PER_PROGRAM

    def kernel(rows_ref, offs_ref, *refs):
        hbm = refs[:n_arrays]
        outs = refs[n_arrays : 2 * n_arrays]
        scr = refs[2 * n_arrays : 3 * n_arrays]
        sems = refs[3 * n_arrays]
        base = pl.program_id(0) * P
        dmas = []
        for j in range(P):  # static unroll; all n·P copies in flight at once
            rb = pl.multiple_of(rows_ref[base + j], P)
            for a in range(n_arrays):
                d = pltpu.make_async_copy(
                    hbm[a].at[pl.ds(rb, r_rows), :],
                    scr[a].at[pl.ds(j * r_rows, r_rows), :],
                    sems.at[a * P + j],
                )
                d.start()
                dmas.append(d)
        for d in dmas:
            d.wait()
        for j in range(P):  # in-VMEM unaligned window extraction
            off = offs_ref[base + j]
            for a in range(n_arrays):
                outs[a][pl.ds(j * w_rows, w_rows), :] = _extract_window(
                    scr[a], j * r_rows, off, w_rows
                )

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def gather_posting_spans(
    chunk_ids: jax.Array,
    tf: jax.Array,
    starts: jax.Array,
    *,
    window: int,
    dl: jax.Array | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, ...]:
    """Copy ``window``-wide posting spans for every start offset.

    Args:
        chunk_ids: i32 [NNZ_pad] CSR row ids, NNZ_pad a multiple of 128 and
            ≥ indptr[-1] + ``dma_slack(window)``.
        tf: f32 [NNZ_pad] matching term frequencies.
        starts: i32 [G] span offsets (one per (query, term)).
        dl: optional f32 [NNZ_pad] per-posting doc lengths (SparseIndex.dl)
            — gathered as a third span, saving the runtime
            ``chunk_len[rows]`` random gather (1.74 ms/call at nnz=67M).

    Returns:
        ``(ids [G, window] i32, tf [G, window] f32[, dl [G, window] f32])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G = starts.shape[0]
    w_eff = -(-window // _LANES) * _LANES
    w_rows = w_eff // _LANES
    r_rows = w_rows + ALIGN // _LANES           # extended span rows
    P = _SPANS_PER_PROGRAM
    g_pad = (-G) % P
    starts_p = (
        jnp.concatenate([starts, jnp.zeros((g_pad,), starts.dtype)])
        if g_pad else starts
    )
    Gp = G + g_pad
    base_rows = (starts_p // ALIGN) * (ALIGN // _LANES)  # ÷8 by construction
    offs = starts_p % ALIGN
    arrays = [chunk_ids, tf] + ([dl] if dl is not None else [])
    dtypes = [jnp.int32, jnp.float32, jnp.float32][: len(arrays)]
    flats = [a.reshape(-1, _LANES) for a in arrays]
    n = len(arrays)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # base rows + in-span offsets
        grid=(Gp // P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,  # CSR stays in HBM
        out_specs=[
            pl.BlockSpec((P * w_rows, _LANES), lambda i, rows, offs: (i, 0))
        ] * n,
        scratch_shapes=[
            pltpu.VMEM((P * r_rows, _LANES), dt) for dt in dtypes
        ] + [pltpu.SemaphoreType.DMA((n * P,))],
    )
    outs = pl.pallas_call(
        _make_kernel(r_rows, w_rows, n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Gp * w_rows, _LANES), dt) for dt in dtypes
        ],
        interpret=interpret,
    )(base_rows, offs, *flats)

    # [Gp*w_rows, 128] rows are already each span's flat window — a
    # layout-preserving reshape, then trim the lane padding
    return tuple(o.reshape(Gp, w_eff)[:G, :window] for o in outs)
