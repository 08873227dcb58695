"""Symmetric per-row int8 quantization of the embedding store.

The BASELINE metric is recall + QPS **at equal memory** (BASELINE.md; the
reference serves f32 FAISS flat-IP, src/ingestion.py:79-84).  An int8 row
store quarters the bytes of the corpus matrix — the exact-scan and IVF
probes are HBM-bandwidth-bound (DESIGN.md), so fewer bytes is the one
lever left after the layout work.  Unlike the bf16 variant (which lost
its bandwidth win to a per-step f32 upcast of the gathered block), int8
keeps the inner product in int8×int8→int32 on the MXU and applies the
dequantization as a cheap rank-1 scale on the [B, N] result:

    score(q, x) ≈ (sq · sx) · Σ round(q/sq)·round(x/sx)

with per-row scales sx = max|x|/127 and per-query sq = max|q|/127.
For unit-norm D=1024 embeddings the relative score error is ~1e-3, i.e.
recall@10 ≈ 0.99 vs the f32 oracle on clustered corpora (measured in
bench.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .topk import NEG_INF, _mask_scores

_EPS = 1e-12


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: returns ``(q int8 [N, D], scale f32 [N])``
    with ``x ≈ q * scale[:, None]``.  All-zero rows get scale 0 (and score
    exactly 0 against everything, matching the f32 behaviour of padding)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > _EPS, 1.0 / jnp.maximum(scale, _EPS), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_scores(q: jax.Array, emb_i8: jax.Array, row_scale: jax.Array) -> jax.Array:
    """``[B, N]`` f32 scores of f32/bf16 queries against an int8 row store:
    quantize the query per row, int8×int8→int32 on the MXU, rank-1 dequant
    epilogue.  The single definition of the quantized-dot scheme for every
    full-matrix site (exact scan, engine pair_topk, sharded shards); the
    IVF probe keeps its own gather-shaped ``bd,bwd`` variant."""
    q_i8, q_scale = quantize_rows(q.astype(jnp.float32))
    acc = jax.lax.dot_general(
        q_i8, emb_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q_scale[:, None] * row_scale[None, :]


@functools.partial(jax.jit, static_argnames=("k",))
def int8_topk(
    q: jax.Array,
    emb_i8: jax.Array,
    row_scale: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact-scan top-k against an int8 row store.

    Args:
        q: ``[B, D]`` f32/bf16 queries (quantized here, per query row).
        emb_i8: ``[N, D]`` int8 corpus rows.
        row_scale: ``[N]`` f32 per-row scales.
        k: neighbours (static).
        mask: optional ``[N]`` or ``[B, N]`` routing mask.

    Returns ``(values [B, k] f32, indices [B, k] i32)``, descending.
    """
    n = emb_i8.shape[0]
    k = min(k, n)
    # One-shot at every N: at [127, 10M] the sort over [B, N] is ~2/3 of
    # the 79.6 ms call, but every exact two-stage tried either loses to
    # it or cannot be trusted/compiled on this backend (DESIGN.md
    # "PartialReduce").  Callers who can trade a measured sliver of
    # recall for the corpus-read roofline (~24 ms) use ops.topk.approx_topk
    # (the engine's scan_rt knob); bounded-memory exact is blocked_topk.
    scores = _mask_scores(int8_scores(q, emb_i8, row_scale), mask)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)
