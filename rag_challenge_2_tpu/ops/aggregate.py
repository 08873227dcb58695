"""Hit aggregation + bonus scoring as sorted-segment ops.

Replaces the reference's lock-guarded Python dict loop
(reference src/retrieval.py:1552-1599) and its scoring rule
(reference src/retrieval.py:1639-1661):

    final = max(similarities)
            * (1 + 0.2 * (distinct_query_hits - 1))      # query-hit bonus
            * (1 + 0.1 * (distinct_methods - 1))          # method diversity

with the same dedup semantics: a query is counted once per key even if
several of its hits land on the key (parent-page dedup,
reference src/retrieval.py:1596-1599), and a method is counted once per key
(reference src/retrieval.py:1585-1593).

Device formulation: every (query, method, rank) hit becomes one row of flat
arrays ``(key, sim, qid, mid)``; we sort by composite integer keys and use
first-occurrence flags + segment reductions — static shapes, O(L log L),
no host round-trips.  Keys are aggregation targets: ``page_seg`` row values
when ``return_parent_pages`` else chunk row ids.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from .topk import NEG_INF

_BIG = jnp.int32(2**30)

QUERY_BONUS = 0.2   # reference src/retrieval.py:1645
METHOD_BONUS = 0.1  # reference src/retrieval.py:1655


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedCandidates:
    """Top-n aggregated candidates, sorted by final score descending."""

    key: jax.Array        # i32 [top_n] — page_seg or chunk row (-1 = empty slot)
    score: jax.Array      # f32 [top_n] — final (bonused) score
    base_sim: jax.Array   # f32 [top_n] — max raw similarity
    n_queries: jax.Array  # i32 [top_n] — distinct queries hitting the key
    n_methods: jax.Array  # i32 [top_n] — distinct retrieval methods
    rep_row: jax.Array    # i32 [top_n] — chunk row achieving the max sim


def _first_occurrence(sorted_vals: jax.Array) -> jax.Array:
    prev = jnp.concatenate([jnp.full((1,), -1, sorted_vals.dtype), sorted_vals[:-1]])
    return sorted_vals != prev


@functools.partial(jax.jit, static_argnames=("top_n",))
def fuse_hits(
    key: jax.Array,
    sim: jax.Array,
    qid: jax.Array,
    mid: jax.Array,
    row: jax.Array,
    valid: jax.Array,
    *,
    top_n: int,
) -> FusedCandidates:
    """Aggregate flat hit lists into bonus-scored, deduped top-n candidates.

    All inputs are ``[L]`` flat arrays (L = queries × methods × k, static).
    """
    L = key.shape[0]
    key_s = jnp.where(valid, key, _BIG)

    # ---- lexicographic sort by (key, qid): count distinct queries per key ----
    # multi-operand lax.sort avoids composite-integer keys (which overflow
    # int32 once key * max_queries exceeds 2**31)
    ck, cq, sim_s, row_s = jax.lax.sort(
        (key_s, qid, sim, row), num_keys=2
    )
    new_key = _first_occurrence(ck)
    seg = jnp.cumsum(new_key.astype(jnp.int32)) - 1          # contiguous unique-key ids
    new_pair = new_key | _first_occurrence(cq)
    nq = jax.ops.segment_sum(new_pair.astype(jnp.int32), seg, num_segments=L)

    # base similarity (max) per key + representative row
    sim_masked = jnp.where(ck < _BIG, sim_s, NEG_INF)
    base = jax.ops.segment_max(sim_masked, seg, num_segments=L)
    is_best = sim_masked >= base[seg]
    rep = jax.ops.segment_max(jnp.where(is_best, row_s, -1), seg, num_segments=L)

    # unique-key values in segment order
    ukey = jax.ops.segment_max(jnp.where(new_key, ck, -1), seg, num_segments=L)

    # ---- lexicographic sort by (key, mid): count distinct methods per key ----
    ck_m, cm = jax.lax.sort((key_s, mid), num_keys=2)
    new_key_m = _first_occurrence(ck_m)
    seg_m = jnp.cumsum(new_key_m.astype(jnp.int32)) - 1
    nm = jax.ops.segment_sum(
        (new_key_m | _first_occurrence(cm)).astype(jnp.int32), seg_m, num_segments=L
    )  # same unique-key order as seg (both ascending in key)

    n_unique = jnp.sum(new_key.astype(jnp.int32))
    slot = jnp.arange(L, dtype=jnp.int32)
    live = (slot < n_unique) & (ukey < _BIG)

    qb = 1.0 + QUERY_BONUS * jnp.maximum(nq - 1, 0).astype(jnp.float32)
    mb = 1.0 + METHOD_BONUS * jnp.maximum(nm - 1, 0).astype(jnp.float32)
    final = jnp.where(live, base * qb * mb, NEG_INF)

    k = min(top_n, L)
    top_scores, top_slots = jax.lax.top_k(final, k)
    sel = lambda a: a[top_slots]
    empty = top_scores <= NEG_INF / 2
    return FusedCandidates(
        key=jnp.where(empty, -1, sel(ukey)),
        score=jnp.where(empty, 0.0, top_scores),
        base_sim=jnp.where(empty, 0.0, sel(base)),
        n_queries=jnp.where(empty, 0, sel(nq)),
        n_methods=jnp.where(empty, 0, sel(nm)),
        rep_row=jnp.where(empty, -1, sel(rep)),
    )
