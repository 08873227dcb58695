"""Exact large-N top-k built on the TPU's fused PartialReduce (approx_max_k).

The 10M-row regime (BASELINE config 5; reference hot loop
src/retrieval.py:1140 at FAISS scale) measures like this on v5e for
``[127, 10M]`` int8 scores (one session, back to back):

=====================================  ========
int8 matmul → ``lax.top_k`` (one-shot)  152.6 ms
…  → chunked ``reduce_window`` 2-stage  compile-fails (Mosaic scoped VMEM)
…  → reshape-max 2-stage                compile-fails (5 GB retile copy)
block dots + reshape-max + rescore      113.0 ms
int8 matmul → ``approx_max_k``           23.8 ms
=====================================  ========

``lax.top_k`` forces the [B, N] score matrix into HBM and sorts all N
columns; every "compute a group-max myself" variant either re-materializes
the scores or dies in Mosaic.  ``approx_max_k`` is the ONE reduction XLA
fuses into the matmul epilogue — 23.8 ms is the pure corpus-read time, the
scores never touch HBM.  Its approximation is structural, not numeric:
PartialReduce keeps the EXACT max of each of L disjoint bins and discards
the rest.  So run it as stage 1 of an exact two-stage:

1. ``approx_max_k(scores, k, aggregate_to_topk=False)`` → exact per-bin
   maxima ``[B, L]``, fused with the matmul.
2. ``top_k`` over the L bin maxima → the k best bins.  Every true top-k
   element's bin-max is ≥ that element, so its bin survives (the top-k
   elements occupy ≤ k bins, and any bin they occupy beats any unselected
   bin).
3. Re-score the selected bins' members (≈ k·bin-width rows per query) and
   take the exact top-k.  For an int8 store the re-score is the same
   int8×int8→int32 dot — integer accumulation is order-invariant, so the
   values are BIT-identical to the one-shot kernel's.

Bin membership is undocumented backend behaviour and is PROBED, never
assumed.  Measured layouts on v5e are lane-striped arithmetic
progressions — bin = rows ``left_row + stride·t`` at one lane, e.g.
contiguous blocks (stride 1) at coarse L, parity-interleaved 512-row
superblocks (stride 2) at L≈n/256 — so the probe recovers, per bin, its
lane, first row, last row (arange / negated-arange probes) and the row
stride (a third probe that masks each bin's first row), then REQUIRES the
enumerated membership to be an exact partition of ``[0, n)`` plus a
random-scores bin-max spot check.  Any mismatch — a future backend
layout, CPU's different emulation — disables the kernel for that shape
and callers fall back to ``lax.top_k`` paths.

Tie-break caveat (documented, not hidden): within the candidate set the
final ``top_k`` prefers the lowest row exactly like the one-shot kernel,
but if MORE than k bins tie exactly at the k-th bin-max value, a tied bin
holding the lowest-row element can be cut in stage 2 — the returned
VALUES are still exact, the winning INDEX among exact equals may differ.
Real-valued scores never produce such cross-bin ties; use
``ops.topk.twostage_topk`` where strict index parity under adversarial
ties matters more than speed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .topk import NEG_INF

_LANES = 128
# preferred members-per-bin: ~256 keeps stage 3 at ~k·256 rows per query
_TARGET_WIDTH = 256
_RECALL_CANDIDATES = (0.999, 0.9999, 0.99, 0.95)


@dataclasses.dataclass(frozen=True)
class BinModel:
    """Probed + partition-verified PartialReduce layout for one (n, k)."""

    n: int
    k: int
    recall_target: float
    n_bins: int               # L
    stride: int               # row step between a bin's members
    width: int                # max members per bin
    left_row: np.ndarray      # i32 [L] — first member row (j // 128)
    n_valid: np.ndarray       # i32 [L] — member count (≤ width)

    def members(self) -> np.ndarray:
        """[L, width] global j per bin, -1 where past the bin's count."""
        lane = np.arange(self.n_bins) % _LANES
        rows = self.left_row[:, None] + self.stride * np.arange(self.width)[None, :]
        j = rows * _LANES + lane[:, None]
        j[np.arange(self.width)[None, :] >= self.n_valid[:, None]] = -1
        return j


def _partial_probe(x, k, rt):
    # deliberately NOT one fused jit: an iota→PartialReduce fusion has no
    # parameter inputs and crashes XLA's TPU fusion emitter
    # ("Check failed: !params_.inputs.empty()") — eager dispatch
    # materializes the probe array first, exactly like production callers
    # whose scores are real buffers
    return jax.lax.approx_max_k(x, k, recall_target=rt, aggregate_to_topk=False)


@functools.lru_cache(maxsize=64)
def probe_bin_model(n: int, k: int) -> Optional[BinModel]:
    """Probe + verify the backend's PartialReduce layout for ``[*, n]``.

    Returns None (→ callers use plain top_k paths) when approx_max_k is
    unavailable, stays too coarse, or the recovered layout fails the
    partition / bin-max verification."""
    try:
        best = None
        for rt in _RECALL_CANDIDATES:
            x = jnp.arange(n, dtype=jnp.float32)[None, :]
            v, i = _partial_probe(x, k, rt)
            L = int(v.shape[1])
            if L >= n:    # backend fell back to exact top_k — nothing to win
                continue
            width = n / L
            if best is None or abs(width - _TARGET_WIDTH) < abs(best[1] - _TARGET_WIDTH):
                best = (rt, width, np.asarray(i)[0].astype(np.int64))
            if _TARGET_WIDTH / 2 <= width <= _TARGET_WIDTH * 2:
                break
        if best is None or best[1] > 16 * _TARGET_WIDTH:
            return None
        rt, _w, right = best
        L = len(right)
        if L % _LANES:
            return None
        x = jnp.arange(n, dtype=jnp.float32)[None, :]
        _, i_left = _partial_probe(-x, k, rt)
        left = np.asarray(i_left)[0].astype(np.int64)
        lane = np.arange(L) % _LANES
        if ((left % _LANES) != lane).any() or ((right % _LANES) != lane).any():
            return None
        left_row, right_row = left // _LANES, right // _LANES
        # third probe: mask each bin's first member → new minimum reveals
        # the row stride (bins with a single member contribute nothing)
        xm = x.at[0, left].set(jnp.inf)
        _, i_second = _partial_probe(-xm, k, rt)
        second_row = np.asarray(i_second)[0].astype(np.int64) // _LANES
        multi = right_row > left_row
        if not multi.any():
            return None
        strides = np.unique(second_row[multi] - left_row[multi])
        if len(strides) != 1 or strides[0] < 1:
            return None
        stride = int(strides[0])
        if ((right_row - left_row) % stride).any():
            return None
        n_valid = ((right_row - left_row) // stride + 1).astype(np.int64)
        width = int(n_valid.max())
        model = BinModel(
            n=n, k=k, recall_target=rt, n_bins=L, stride=stride, width=width,
            left_row=left_row.astype(np.int32), n_valid=n_valid.astype(np.int32),
        )
        # the enumerated membership must partition [0, n) exactly
        mem = model.members()
        flat = mem[mem >= 0]
        if len(flat) != n:
            return None
        seen = np.zeros(n, bool)
        seen[flat] = True      # IndexError on out-of-range → except → None
        if not seen.all():
            return None
        # functional spot-check: sampled bins' maxima over random scores
        r = jax.random.normal(jax.random.PRNGKey(0), (2, n), jnp.float32)
        v_r, _ = _partial_probe(r, k, rt)
        rng = np.random.default_rng(0)
        sample = rng.choice(L, size=min(64, L), replace=False)
        rows_j = jnp.asarray(np.maximum(mem[sample], 0))
        vals = jnp.where(
            jnp.asarray(mem[sample] >= 0)[None],
            r[:, rows_j.reshape(-1)].reshape(2, len(sample), width), NEG_INF,
        )
        member_max = np.asarray(jnp.max(vals, axis=2))
        if not np.allclose(np.asarray(v_r)[:, sample], member_max):
            return None
        return model
    except Exception:
        return None


def _bin_candidates(gids: jax.Array, model: BinModel) -> jax.Array:
    """Global row ids of every member of the selected bins, ascending per
    query.  gids ``[B, kg]`` bin slots → ``[B, kg·width]`` rows, -1 where
    a bin has fewer than ``width`` members."""
    left = jnp.asarray(model.left_row)[gids]                    # [B, kg]
    nv = jnp.asarray(model.n_valid)[gids]
    lane = (gids % _LANES).astype(jnp.int32)
    t = jnp.arange(model.width, dtype=jnp.int32)
    rows = left[:, :, None] + model.stride * t[None, None, :]
    j = rows * _LANES + lane[:, :, None]
    j = jnp.where(t[None, None, :] < nv[:, :, None], j, -1)
    B, kg, _ = j.shape
    # ascending rows (with -1 pushed to the back) → the final top_k breaks
    # exact ties toward the lowest row, like lax.top_k
    key = jnp.where(j >= 0, j, jnp.iinfo(jnp.int32).max)
    return jnp.sort(key.reshape(B, kg * model.width), axis=1)


def partial_from_scores(
    scores: jax.Array, k: int, model: BinModel
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over materialized ``[B, n]`` scores without sorting n
    columns: fused bin-max read, then a gather of k·width candidate
    columns.  Same contract as ``lax.top_k`` (see module tie caveat)."""
    B, n = scores.shape
    k = min(k, n)
    gmax, _ = jax.lax.approx_max_k(
        scores, model.k, recall_target=model.recall_target,
        aggregate_to_topk=False,
    )
    kg = min(k, model.n_bins)
    _, gids = jax.lax.top_k(gmax, kg)
    cand = _bin_candidates(gids.astype(jnp.int32), model)
    ok = cand < n
    safe = jnp.where(ok, cand, 0)
    cs = jnp.where(ok, jnp.take_along_axis(scores, safe, axis=1), NEG_INF)
    vals, j = jax.lax.top_k(cs, k)
    return vals, jnp.take_along_axis(safe, j, axis=1).astype(jnp.int32)


def partial_int8_topk(
    q: jax.Array,
    emb_i8: jax.Array,
    row_scale: jax.Array,
    k: int,
    model: BinModel,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k against an int8 row store with NO [B, N] score
    materialization: the bin-max fuses into the int8 matmul epilogue
    (scores never reach HBM) and stage 3 re-scores gathered candidate
    rows with the same order-invariant int8×int8→int32 dot — values are
    bit-identical to ``ops.quant.int8_topk``'s one-shot path."""
    from .quant import quantize_rows

    n = emb_i8.shape[0]
    k = min(k, n)
    qf = q.astype(jnp.float32)
    q8, q_scale = quantize_rows(qf)
    acc = jax.lax.dot_general(
        q8, emb_i8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * q_scale[:, None] * row_scale[None, :]
    if mask is not None:
        scores = jnp.where(mask if mask.ndim == 2 else mask[None, :],
                           scores, NEG_INF)
    gmax, _ = jax.lax.approx_max_k(
        scores, model.k, recall_target=model.recall_target,
        aggregate_to_topk=False,
    )
    kg = min(k, model.n_bins)
    _, gids = jax.lax.top_k(gmax, kg)
    cand = _bin_candidates(gids.astype(jnp.int32), model)       # [B, C]
    ok = cand < n
    safe = jnp.where(ok, cand, 0)
    rows = emb_i8[safe]                                         # [B, C, D]
    acc_c = jnp.einsum("bd,bcd->bc", q8, rows, preferred_element_type=jnp.int32)
    cs = acc_c.astype(jnp.float32) * q_scale[:, None] * row_scale[safe]
    if mask is not None:
        ok = ok & (
            jnp.take_along_axis(mask, safe, axis=1) if mask.ndim == 2
            else mask[safe]
        )
    cs = jnp.where(ok, cs, NEG_INF)
    vals, j = jax.lax.top_k(cs, k)
    return vals, jnp.take_along_axis(safe, j, axis=1).astype(jnp.int32)
