"""Graph-traversal retrieval: SSG, Triangulation, hybrid expansion.

Re-design of the reference's per-hop FAISS loops
(``_ssg_search`` reference src/retrieval.py:585-688, ``_triangulation_search``
:690-806, hybrid orchestration :1258-1418) as batched on-device loops:

* every anchor (query × doc pair, or basic-top-K seed) traverses in
  parallel as one batch dimension;
* a hop = one matmul against the corpus + ``lax.top_k`` — the reference's
  per-candidate ``faiss.reconstruct`` gather is a plain embedding-table
  gather on device;
* the visited set is the path itself (≤ max_hops+1 entries), checked by
  broadcast comparison — no [A, N] visited bitmap;
* SSG early-stop ("similarity stopped improving",
  reference src/retrieval.py:654) is per-anchor predication, not a break.

Exact semantic match to the reference:
* candidates = top-(neighbor_k+1) neighbours of the *current chunk vector*
  with visited ones dropped (so if every one of the k+1 is visited, the
  traversal stops — matching the "no candidates → break" path);
* SSG picks max chunk-to-chunk similarity and stops when it does not
  strictly improve on the previous hop;
* Triangulation picks max ``1/(1+‖(q+c+cand)/3 − q‖₂)`` and never
  early-stops;
* outputs are the traversal paths; final hit similarities are re-computed
  as query·chunk in batch (the reference recomputes them at emission,
  src/retrieval.py:1216-1233).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.topk import NEG_INF, _mask_scores


class TraversalResult(NamedTuple):
    """Paths of shape [A, max_hops+1]; position 0 is the anchor."""

    path: jax.Array        # i32 [A, H+1], -1 where traversal stopped
    valid: jax.Array       # bool [A, H+1]
    hop_score: jax.Array   # f32 [A, H+1] — internal per-hop score
                           # (SSG: chunk-to-chunk sim; Tri: centroid score;
                           #  anchor slot: 1.0 / query·anchor respectively)
    cand_ids: jax.Array    # i32 [A, H, R] — per-hop candidate rows, -1 pad
                           # (reference records top-10 candidates per hop,
                           #  src/retrieval.py:665 `candidates[:10]`)
    cand_scores: jax.Array  # f32 [A, H, R] — matching step scores


CAND_RECORD = 10  # candidates kept per hop (reference src/retrieval.py:665)


def _gather_vecs(emb, row_scale, idx):
    """Dequantizing row gather: f32 vectors whatever the store dtype."""
    v = emb[idx].astype(jnp.float32)
    if row_scale is not None:
        v = v * row_scale[idx][..., None]
    return v


def _hop_candidates(cur_vec, emb, row_scale, mask, path, neighbor_k):
    """Top-(k+1) neighbours of the current vectors, with visited flags."""
    if row_scale is not None:
        # int8 store: XLA fuses the int8→f32 convert into the matmul's
        # operand read; the per-row dequant is a rank-1 epilogue
        scores = jnp.einsum(
            "ad,nd->an", cur_vec, emb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * row_scale[None, :]
    else:
        scores = jnp.einsum(
            "ad,nd->an", cur_vec, emb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    scores = _mask_scores(scores, mask)
    vals, ids = jax.lax.top_k(scores, neighbor_k + 1)          # [A, k+1]
    visited = jnp.any(path[:, :, None] == ids[:, None, :], axis=1)
    return vals, ids, visited


@functools.partial(
    jax.jit, static_argnames=("max_hops", "neighbor_k", "mode")
)
def traverse(
    emb: jax.Array,
    anchor_idx: jax.Array,
    query_vec: jax.Array,
    mask: jax.Array,
    row_scale: Optional[jax.Array] = None,
    *,
    max_hops: int = 4,
    neighbor_k: int = 30,
    mode: str = "ssg",
) -> TraversalResult:
    """Run SSG or Triangulation traversal for a batch of anchors.

    Args:
        emb: ``[N, D]`` corpus embeddings.
        anchor_idx: ``[A]`` starting chunk rows (-1 = inactive anchor).
        query_vec: ``[A, D]`` query embedding per anchor (SSG ignores it for
            stepping but the result re-scoring uses it; Triangulation uses it
            for the centroid).
        mask: ``[A, N]`` or ``[N]`` bool — rows the anchor may visit
            (doc membership × routing × validity).
        mode: "ssg" | "triangulation".
    """
    assert mode in ("ssg", "triangulation")
    A = anchor_idx.shape[0]
    H = max_hops

    path = jnp.full((A, H + 1), -1, jnp.int32)
    path = path.at[:, 0].set(anchor_idx)
    active0 = anchor_idx >= 0
    anchor_vec = _gather_vecs(emb, row_scale, jnp.maximum(anchor_idx, 0))
    anchor_q_sim = jnp.einsum("ad,ad->a", query_vec.astype(jnp.float32), anchor_vec)
    hop_score = jnp.zeros((A, H + 1), jnp.float32)
    hop_score = hop_score.at[:, 0].set(
        jnp.where(active0, 1.0 if mode == "ssg" else anchor_q_sim, 0.0)
    )

    if mask.ndim == 1:
        mask = jnp.broadcast_to(mask[None, :], (A, mask.shape[0]))

    R = min(CAND_RECORD, neighbor_k + 1)
    cand_ids = jnp.full((A, H, R), -1, jnp.int32)
    cand_scores = jnp.zeros((A, H, R), jnp.float32)

    def body(hop, state):
        path, hop_score, cand_ids, cand_scores, cur_idx, cur_vec, prev_sim, active = state
        vals, ids, visited = _hop_candidates(
            cur_vec, emb, row_scale, mask, path, neighbor_k
        )
        cand_ok = (~visited) & (vals > NEG_INF / 2)

        if mode == "ssg":
            # step score = chunk-to-chunk similarity == the search score itself
            step_score = vals
        else:
            cand_vec = _gather_vecs(emb, row_scale, jnp.maximum(ids, 0))  # [A, k+1, D]
            centroid = (query_vec[:, None, :].astype(jnp.float32)
                        + cur_vec[:, None, :] + cand_vec) / 3.0
            dist = jnp.linalg.norm(centroid - query_vec[:, None, :], axis=-1)
            step_score = 1.0 / (1.0 + dist)

        step_score = jnp.where(cand_ok, step_score, NEG_INF)
        best_j = jnp.argmax(step_score, axis=1)                       # [A]
        best_score = jnp.take_along_axis(step_score, best_j[:, None], 1)[:, 0]
        best_id = jnp.take_along_axis(ids, best_j[:, None], 1)[:, 0]
        has_cand = jnp.any(cand_ok, axis=1)

        step = active & has_cand
        if mode == "ssg":
            # early stop: similarity must strictly improve (reference :654)
            step = step & (best_score > prev_sim)

        new_idx = jnp.where(step, best_id, cur_idx)
        path = path.at[:, hop + 1].set(jnp.where(step, best_id, -1))
        hop_score = hop_score.at[:, hop + 1].set(jnp.where(step, best_score, 0.0))

        # record the hop's top-R candidates (observability parity with the
        # reference's traversal_details, src/retrieval.py:661-668)
        r_vals, r_j = jax.lax.top_k(step_score, R)
        r_ids = jnp.take_along_axis(ids, r_j, axis=1)
        rec_ok = step[:, None] & (r_vals > NEG_INF / 2)
        cand_ids = cand_ids.at[:, hop, :].set(jnp.where(rec_ok, r_ids, -1))
        cand_scores = cand_scores.at[:, hop, :].set(jnp.where(rec_ok, r_vals, 0.0))

        new_vec = jnp.where(
            step[:, None], _gather_vecs(emb, row_scale, jnp.maximum(new_idx, 0)), cur_vec
        )
        prev_sim = jnp.where(step, best_score, prev_sim)
        return path, hop_score, cand_ids, cand_scores, new_idx, new_vec, prev_sim, step

    prev_sim0 = jnp.where(active0, 1.0, NEG_INF)  # anchor self-similarity (reference :613)
    state = (
        path, hop_score, cand_ids, cand_scores,
        jnp.maximum(anchor_idx, 0), anchor_vec, prev_sim0, active0,
    )
    path, hop_score, cand_ids, cand_scores, *_ = jax.lax.fori_loop(0, H, body, state)
    return TraversalResult(
        path=path, valid=path >= 0, hop_score=hop_score,
        cand_ids=cand_ids, cand_scores=cand_scores,
    )


def emit_hits(
    emb: jax.Array,
    query_vec: jax.Array,
    res: TraversalResult,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Re-score traversal paths as query·chunk similarities.

    Mirrors the reference's emission re-computation
    (src/retrieval.py:1216-1233): every path element (anchor included)
    becomes a hit with similarity = inner(query, chunk).

    Returns (rows [A, H+1] i32 with -1 for invalid, sims [A, H+1] f32).
    """
    rows = res.path
    vecs = _gather_vecs(emb, row_scale, jnp.maximum(rows, 0))     # [A, H+1, D]
    sims = jnp.einsum("ad,ahd->ah", query_vec.astype(jnp.float32), vecs)
    sims = jnp.where(res.valid, sims, 0.0)
    return rows, sims
