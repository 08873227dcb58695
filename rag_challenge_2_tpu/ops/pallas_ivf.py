"""Pallas IVF probe scoring: contiguous list-span DMA fused with the
query matvec.

An IVF probe reads ``emb_perm[start : start + len]`` — a CONTIGUOUS row
range per (query, probe) — but XLA only sees ``emb_perm[pos]`` with
computed indices and lowers a random row gather (~13 ns/element on the
scalar core): measured 28.9 qps for 127 queries at N=10M, nprobe=16 on
v5e — the probe path ran ~100× below DMA speed and LOST to the exact
full scan.  Same access-pattern story as the BM25 posting spans
(ops/pallas_bm25.py), with the scoring matvec fused in so the span never
round-trips through HBM:

* 8 spans per program, all DMAs in flight together (HBM → VMEM);
* per span an MXU matvec ``q [1, D] · span [W, D]ᵀ`` (int8→int32 or f32);
* scores come out as ``[G, 1, W]`` f32; row ids / int8 row scales for
  the same spans ride the 1-D span kernel
  (pallas_bm25.gather_posting_spans).

Alignment contract (checked STATICALLY via ``IVFIndex.list_align`` /
``dma_pad_rows`` — no device sync): Mosaic cannot lower dynamic int8
sublane slices or multi-tile dynamic lane rolls (both measured as
compile crashes), so instead of extracting unaligned windows in-kernel,
``index/ivf.py`` builds pad every list START to ``_ROW_ALIGN`` rows and
over-allocate ``dma_slack_rows`` past the last list — spans are then
tile-aligned by construction and the extended DMA never reads out of
bounds.  Row-scale/q-scale multiplication, list-length masking, routing
masks and the final top-k stay in XLA — they fuse fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SPANS_PER_PROGRAM = 8
ROW_ALIGN = 32           # int8 VMEM tile is (32, 128); 32 also covers f32's 8
_VMEM_SPAN_BUDGET = 12 * 1024 * 1024  # scratch cap (VMEM ~16 MB/core)


def dma_slack_rows(max_list: int) -> int:
    """Row over-allocation builds must add past the last list end so the
    extended span DMAs never read out of bounds.  Sized to also satisfy
    pallas_bm25.dma_slack for the flat row_ids/row_scale span gathers
    (ALIGN=1024 elements there)."""
    w_eff = -(-max(max_list, 1) // _LANES) * _LANES
    return w_eff + 1024 + ROW_ALIGN


def _spans_per_program(w_rows: int, dim: int, itemsize: int) -> int:
    """As many concurrent span DMAs as fit the VMEM scratch budget
    (more in-flight copies hide DMA latency; huge lists drop to 1)."""
    per_span = w_rows * dim * itemsize
    return max(1, min(_SPANS_PER_PROGRAM, _VMEM_SPAN_BUDGET // max(per_span, 1)))


def _make_kernel(w_rows: int, P: int, acc_dtype, store_dtype):
    def kernel(rows_ref, q_ref, emb_hbm, out_ref, scr, sems):
        base = pl.program_id(0) * P
        cps = []
        for j in range(P):  # static unroll; all P copies in flight at once
            rb = pl.multiple_of(rows_ref[base + j], ROW_ALIGN)
            cp = pltpu.make_async_copy(
                emb_hbm.at[pl.ds(rb, w_rows), :],
                scr.at[pl.ds(j * w_rows, w_rows), :],
                sems.at[j],
            )
            cp.start()
            cps.append(cp)
        for j in range(P):
            cps[j].wait()
            acc = jax.lax.dot_general(
                q_ref[pl.ds(j, 1), 0, :],
                scr[pl.ds(j * w_rows, w_rows), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
                # f32 stores MUST score at full precision: the MXU's
                # default bf16-mantissa passes reorder near-ties and cost
                # measured recall vs the XLA scan path (r03 IVF-1M
                # regression: 0.9732 vs 0.9992 @ nprobe=8, same index —
                # scripts/ivf_regression_probe.py).  The probe is
                # DMA-bound, so the extra MXU passes are hidden.  int8
                # stores accumulate exactly in int32 either way.  The
                # gate is on the STORE dtype, not acc_dtype: bf16 rows
                # also accumulate f32, but an fp32 contract precision on
                # bf16 operands is ill-typed for Mosaic ("Bad lhs type",
                # witnessed on-chip r5) — bf16 stores take the default
                # single-pass MXU contract, which is exactly their point.
                precision=(jax.lax.Precision.HIGHEST
                           if store_dtype == jnp.float32 else None),
            )
            out_ref[pl.ds(j, 1), 0, :] = acc.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def probe_span_scores(
    emb_perm: jax.Array,
    q: jax.Array,
    starts: jax.Array,
    *,
    window: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Inner products of every query against its contiguous probe span.

    Args:
        emb_perm: [N_rows, D] int8/f32/bf16 cluster-ordered rows; list
            starts ``ROW_ALIGN``-aligned and ``dma_slack_rows(window)``
            rows of padding past the last list end (index/ivf.py builds).
        q: [G, D] queries, SAME dtype as ``emb_perm`` (int8 stores pass
            the quantized queries; scales multiply outside).
        starts: [G] i32 span start rows, each a multiple of ROW_ALIGN.
        window: static span width (``IVFIndex.max_list``).

    Returns:
        [G, window] f32 raw dot products (int32 accumulation for int8).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G, D = q.shape
    w_rows = -(-window // _LANES) * _LANES
    acc = jnp.int32 if emb_perm.dtype == jnp.int8 else jnp.float32
    P = _spans_per_program(w_rows, D, emb_perm.dtype.itemsize)
    g_pad = (-G) % P
    if g_pad:
        starts = jnp.concatenate([starts, jnp.zeros((g_pad,), starts.dtype)])
        q = jnp.concatenate([q, jnp.zeros((g_pad, D), q.dtype)])
    Gp = G + g_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # aligned span start rows
        grid=(Gp // P,),
        in_specs=[
            pl.BlockSpec((P, 1, D), lambda i, rows: (i, 0, 0)),  # queries
            pl.BlockSpec(memory_space=pl.ANY),                   # corpus HBM
        ],
        out_specs=pl.BlockSpec((P, 1, w_rows), lambda i, rows: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((P * w_rows, D), emb_perm.dtype),
            pltpu.SemaphoreType.DMA((P,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(w_rows, P, acc, emb_perm.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gp, 1, w_rows), jnp.float32),
        interpret=interpret,
    )(starts, q[:, None, :], emb_perm)
    return out[:G, 0, :window]


def probe_fast_path_ok(index, window: int) -> bool:
    """STATIC safety gate for the fused span kernel (mirrors
    ops.bm25._pick_pallas — these are safety conditions, not tuning):
    list starts tile-aligned, enough row slack past the last list for the
    extended DMAs (this kernel's and the flat row_ids/row_scale span
    gathers), 128-aligned flat arrays, and one span fitting the VMEM
    scratch budget.  All inputs are static index metadata — callable at
    trace time."""
    w_rows = -(-window // _LANES) * _LANES
    span_bytes = w_rows * index.dim * index.emb_perm.dtype.itemsize
    return (
        index.list_align >= ROW_ALIGN
        and index.dma_pad_rows >= dma_slack_rows(window)
        and index.emb_perm.shape[0] % 128 == 0
        # Mosaic memref slices must be lane-aligned along the minor dim:
        # a D that is not a multiple of 128 fails TPU compile ("Slice
        # shape along dimension 1 must be aligned to tiling (128)")
        and index.dim % _LANES == 0
        and span_bytes <= _VMEM_SPAN_BUDGET
    )
