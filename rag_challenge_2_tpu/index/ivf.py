"""IVF-Flat clustered index (the faiss-IVF equivalent, built on TPU).

Layout: rows are permuted so each cluster's rows are contiguous
(``emb_perm``), with ``list_offsets [K+1]`` marking ranges and ``row_ids``
mapping permuted positions back to corpus rows.  Query = coarse top-nprobe
centroid scores, then an exact scan over the probed lists gathered with a
static window (``max_list``), then top-k — all one jitted graph.  Equal
memory vs the flat index: same f32 rows, plus K·D centroids (<1% at
K=√N·4).

Recall target: match faiss IVF-Flat at the same (K, nprobe) on recall@10
vs exact (BASELINE.md config 3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans
from ..ops.topk import NEG_INF


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IVFIndex:
    centroids: jax.Array     # f32 [K, D]
    emb_perm: jax.Array      # f32|bf16|int8 [N_pad, D] — rows grouped by cluster
    row_ids: jax.Array       # i32 [N_pad] — permuted position → corpus row (-1 pad)
    pos_cluster: jax.Array   # i32 [N_pad] — cluster id per permuted position (K pad)
    list_offsets: jax.Array  # i32 [K + 1]
    row_scale: Optional[jax.Array] = None  # f32 [N_pad] when emb_perm is int8
    k_clusters: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_list: int = dataclasses.field(metadata=dict(static=True), default=0)
    dim: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_ivf(
    emb: jax.Array,
    n_clusters: Optional[int] = None,
    iters: int = 10,
    seed: int = 0,
    valid: Optional[jax.Array] = None,
    max_list_size: Optional[int] = None,
) -> IVFIndex:
    """Cluster + permute. ``emb`` may include zero padding rows — pass
    ``valid`` to keep them out of every list.

    ``max_list_size`` balances the lists: oversized clusters are
    re-clustered into ⌈n/cap⌉ sub-centroids (up to 3 rounds).  The probe
    window pads to the longest list, so capping it converts tail imbalance
    directly into probe throughput — measured at 300k×1024: 2.8× probe
    qps at matched recall@10 ≈ 0.997 (nprobe 4).  The cap is SOFT: a
    dense isotropic blob has no meaningful k-means split, so a list may
    exceed the cap by a modest factor rather than be chopped arbitrarily
    (arbitrary chopping would silently cost recall)."""
    N, D = emb.shape
    if valid is None:
        valid_np = np.ones((N,), bool)
    else:
        valid_np = np.asarray(valid)
    rows = np.nonzero(valid_np)[0]
    K = n_clusters or max(1, int(np.sqrt(len(rows)) * 4))
    # The big matrix never round-trips through the host: ``emb`` stays
    # device-resident (through a ~10-20 MB/s relay a 1M×1024 f32 download +
    # re-upload is ~13 min of pure transfer).  Only small arrays (assign,
    # counts, centroids, index vectors) cross the host boundary.
    x = jnp.asarray(emb, jnp.float32)
    if len(rows) != N:
        x = x[jnp.asarray(rows)]
    centroids, assign = kmeans(x, K, iters=iters, seed=seed)
    assign = np.asarray(assign)

    if max_list_size:
        assign = assign.copy()  # np.asarray of a jax array is read-only
        cent_list = list(np.asarray(centroids))
        # a sub-split can itself come out uneven; a few rounds converge
        for _ in range(3):
            counts = np.bincount(assign, minlength=len(cent_list))
            oversized = np.nonzero(counts > max_list_size)[0]
            if len(oversized) == 0:
                break
            for c in oversized:
                members = np.nonzero(assign == c)[0]
                k_sub = int(np.ceil(len(members) / max_list_size))
                # pad the member count to a power of two so the sub-kmeans
                # jit specializes O(log N) times, not per distinct size;
                # pad rows CYCLE through the members so no single point is
                # double-weighted during sub-clustering
                pad_n = 1 << (len(members) - 1).bit_length()
                pad_idx = members[np.arange(pad_n) % len(members)]
                padded = x[jnp.asarray(pad_idx)]  # device gather
                sub_c, sub_a = kmeans(
                    padded, k_sub, iters=max(3, iters // 2),
                    seed=seed + int(c) + 1,
                )
                sub_a = np.asarray(sub_a)[: len(members)]
                sub_c = np.asarray(sub_c)
                # first sub-cluster reuses slot c; the rest append
                cent_list[c] = sub_c[0]
                for j in range(1, k_sub):
                    new_id = len(cent_list)
                    cent_list.append(sub_c[j])
                    assign[members[sub_a == j]] = new_id
        K = len(cent_list)
        centroids = jnp.asarray(np.stack(cent_list), jnp.float32)

    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    counts = np.bincount(sorted_assign, minlength=K)
    offsets = np.zeros((K + 1,), np.int64)
    np.cumsum(counts, out=offsets[1:])

    n_pad = N  # keep the padded length of the source matrix
    # permute on device; pad rows stay zero.  The all-valid case is a single
    # gather — the zeros+set formulation costs an extra full-matrix buffer
    # exactly at the build's peak (4 GB at 1M×1024).
    if len(rows) == n_pad:
        emb_perm_dev = x[jnp.asarray(order)].astype(emb.dtype)
    else:
        emb_perm_dev = jnp.zeros((n_pad, D), emb.dtype)
        emb_perm_dev = emb_perm_dev.at[: len(rows)].set(
            x[jnp.asarray(order)].astype(emb.dtype)
        )
    row_ids = np.full((n_pad,), -1, np.int32)
    pos_cluster = np.full((n_pad,), K, np.int32)
    row_ids[: len(rows)] = rows[order]
    pos_cluster[: len(rows)] = sorted_assign

    return IVFIndex(
        centroids=centroids,
        emb_perm=emb_perm_dev,
        row_ids=jnp.asarray(row_ids),
        pos_cluster=jnp.asarray(pos_cluster),
        list_offsets=jnp.asarray(offsets, jnp.int32),
        k_clusters=K,
        max_list=int(counts.max()) if len(counts) else 0,
        dim=D,
    )


def quantize_ivf(index: IVFIndex) -> IVFIndex:
    """int8 variant of a built IVF index: quarter the row-store memory
    (equal-memory headroom under BASELINE.md's bar) AND quarter the probe's
    gather bytes.  The probe keeps the dot in int8×int8→int32 and
    dequantizes per candidate (ops/quant.py) — unlike the bf16 variant,
    nothing upcasts the gathered ``[B, W, D]`` block."""
    from ..ops.quant import quantize_rows

    if index.emb_perm.dtype == jnp.int8:
        return index  # idempotent — see index/store.quantize_index
    emb_i8, scale = quantize_rows(index.emb_perm)
    return dataclasses.replace(index, emb_perm=emb_i8, row_scale=scale)


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "window"))
def ivf_search(
    index: IVFIndex,
    q: jax.Array,
    k: int,
    nprobe: int = 8,
    window: Optional[int] = None,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k corpus rows per query.  ``mask`` (optional, [N] or [B, N] over
    corpus rows) applies routing exactly as in the flat path — including
    coarse probe selection: clusters containing no mask-eligible rows score
    -inf, so a routed query can never probe only irrelevant clusters.

    window: static per-list gather width (defaults to the longest list).
    """
    B, D = q.shape
    W = int(window or max(index.max_list, 1))
    qf = q.astype(jnp.float32)
    int8_store = index.emb_perm.dtype == jnp.int8
    if int8_store:
        from ..ops.quant import quantize_rows

        q_i8, q_scale = quantize_rows(qf)

    coarse = jnp.dot(qf, index.centroids.T, preferred_element_type=jnp.float32)
    if mask is not None:
        # per-cluster eligibility under the routing mask
        safe_rows_all = jnp.maximum(index.row_ids, 0)
        row_ok = (
            mask[safe_rows_all] if mask.ndim == 1 else mask[:, safe_rows_all]
        ) & (index.row_ids >= 0)                                # [N_pad] or [B, N_pad]
        K1 = index.k_clusters + 1
        if row_ok.ndim == 1:
            elig = jnp.zeros((K1,), bool).at[index.pos_cluster].max(row_ok)
            coarse = jnp.where(elig[None, : index.k_clusters], coarse, NEG_INF)
        else:
            elig = jnp.zeros((B, K1), bool).at[:, index.pos_cluster].max(row_ok)
            coarse = jnp.where(elig[:, : index.k_clusters], coarse, NEG_INF)
    _, probes = jax.lax.top_k(coarse, min(nprobe, index.k_clusters))  # [B, P]
    P = probes.shape[1]
    k_eff = min(k, P * W)

    starts = index.list_offsets[probes]              # [B, P]
    ends = index.list_offsets[probes + 1]            # [B, P]
    offs = jnp.arange(W, dtype=jnp.int32)            # [W]

    # Scan over probes with a running top-k: the candidate-vector gather is
    # [B, W, D] per step instead of [B, P, W, D] at once — this is what
    # keeps 1M-row corpora inside HBM.
    def step(carry, p):
        top_v, top_r = carry
        pos = starts[:, p, None] + offs              # [B, W]
        in_list = offs[None, :] < (ends[:, p] - starts[:, p])[:, None]
        pos = jnp.clip(pos, 0, index.emb_perm.shape[0] - 1)
        cand_rows = index.row_ids[pos]               # [B, W]
        cand_vecs = index.emb_perm[pos]              # [B, W, D]
        if int8_store:
            acc = jnp.einsum(
                "bd,bwd->bw", q_i8, cand_vecs,
                preferred_element_type=jnp.int32,
            )
            scores = (
                acc.astype(jnp.float32)
                * q_scale[:, None]
                * index.row_scale[pos]
            )
        else:
            scores = jnp.einsum(
                "bd,bwd->bw", qf, cand_vecs.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
        ok = in_list & (cand_rows >= 0)
        if mask is not None:
            safe = jnp.maximum(cand_rows, 0)
            ok = ok & (
                mask[safe] if mask.ndim == 1
                else jnp.take_along_axis(mask, safe, axis=1)
            )
        scores = jnp.where(ok, scores, NEG_INF)
        cv = jnp.concatenate([top_v, scores], axis=1)
        cr = jnp.concatenate([top_r, jnp.where(ok, cand_rows, -1)], axis=1)
        nv, ni = jax.lax.top_k(cv, k_eff)
        nr = jnp.take_along_axis(cr, ni, axis=1)
        return (nv, nr), None

    init = (
        jnp.full((B, k_eff), NEG_INF, jnp.float32),
        jnp.full((B, k_eff), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(step, init, jnp.arange(P))
    rows = jnp.where(vals > NEG_INF / 2, rows, -1)
    return vals, rows
