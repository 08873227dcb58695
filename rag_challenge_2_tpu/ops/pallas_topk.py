"""Pallas fused matmul + running top-k kernel.

Streams embedding tiles HBM→VMEM, scores them on the MXU, and maintains the
per-query top-k in a VMEM scratch across sequential grid steps — the
``[B, N]`` score matrix never exists in HBM, so throughput tracks HBM read
bandwidth of the embedding matrix itself (speed of light for exact search).

Merge strategy: a tile's scores only enter the running top-k when the tile
actually beats the current k-th value (checked with one VPU reduction); the
merge itself is k iterations of masked argmax over ``[B, K + TILE_N]`` in
VMEM.  For realistic shapes (k ≤ 64) merges are rare after the first few
tiles, so the steady state is pure matmul + one reduction per tile.

Replaces ``faiss.IndexFlatIP.search`` (reference src/ingestion.py:82-83,
src/retrieval.py:1140).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import NEG_INF


def _merge_topk(combined_vals, combined_idx, k):
    """Select top-k from [B, M] by k iterations of argmax; returns sorted desc.

    No scatter (unsupported in Mosaic): output slots are written with a
    broadcast iota==j mask, which is a pure VPU select.
    """
    B, M = combined_vals.shape
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)

    def body(j, carry):
        vals, out_v, out_i = carry
        best_v = jnp.max(vals, axis=1)  # [B]
        is_max = vals >= best_v[:, None]
        # tie → lowest column, via a min-reduction (no cumsum in Mosaic)
        best_pos = jnp.min(jnp.where(is_max, col_iota, 2**30), axis=1)
        onehot = col_iota == best_pos[:, None]
        best_i = jnp.max(jnp.where(onehot, combined_idx, -1), axis=1)
        slot = out_col == j
        out_v = jnp.where(slot, best_v[:, None], out_v)
        out_i = jnp.where(slot, best_i[:, None], out_i)
        vals = jnp.where(onehot, NEG_INF, vals)
        return vals, out_v, out_i

    out_v = jnp.full((B, k), NEG_INF, jnp.float32)
    out_i = jnp.full((B, k), -1, jnp.int32)
    _, out_v, out_i = jax.lax.fori_loop(0, k, body, (combined_vals, out_v, out_i))
    return out_v, out_i


def _kernel(q_ref, emb_ref, mask_ref, vals_out, idx_out, top_v, top_i, *, k, tile_n, n_total, precision):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        top_v[:] = jnp.full_like(top_v, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    q = q_ref[:]
    tile = emb_ref[:]
    scores = jax.lax.dot_general(
        q,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [B, TILE_N]

    base = step * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gidx = base + col
    ok = (gidx < n_total) & (mask_ref[0, :] > 0)[None, :]
    scores = jnp.where(ok, scores, NEG_INF)

    kth = top_v[:, k - 1]  # current per-query threshold
    any_better = jnp.any(scores > kth[:, None])

    @pl.when(any_better)
    def _():
        cv = jnp.concatenate([top_v[:], scores], axis=1)
        ci = jnp.concatenate([top_i[:], gidx], axis=1)
        nv, ni = _merge_topk(cv, ci, k)
        top_v[:] = nv
        top_i[:] = ni

    @pl.when(step == n_steps - 1)
    def _():
        vals_out[:] = top_v[:]
        idx_out[:] = top_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret", "exact"))
def _pallas_call(q, emb, mask, k, tile_n, interpret=False, exact=True):
    B, D = q.shape
    N = emb.shape[0]
    n_tiles = pl.cdiv(N, tile_n)
    precision = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    kernel = functools.partial(
        _kernel, k=k, tile_n=tile_n, n_total=N, precision=precision
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * emb.dtype.itemsize + B * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, emb, mask[None, :])
    return vals, idx


def pallas_dense_topk(
    q: jax.Array,
    emb: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    tile_n: int = 512,
    interpret: Optional[bool] = None,
    exact: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fused top-k. ``mask`` must be row-shared (``[N]`` or None).

    ``exact=True`` scores in full f32 (FAISS parity); ``exact=False`` uses
    the MXU's native one-pass mode (~4x faster on f32 inputs, bf16-class
    multiply precision) — ranking quality is unaffected for unit-norm
    retrieval embeddings, ties may reorder.
    """
    N, D = emb.shape
    if mask is None:
        mask = jnp.ones((N,), jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_eff = min(k, N)
    vals, idx = _pallas_call(
        q.astype(emb.dtype), emb, mask, k_eff, min(tile_n, N), interpret, exact
    )
    return vals, idx
