"""Dense top-k kernels vs numpy oracle (SURVEY.md §4 test strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rag_challenge_2_tpu.ops.topk import dense_topk
from rag_challenge_2_tpu.ops.pallas_topk import pallas_dense_topk


def _oracle(q, emb, k, mask=None):
    scores = q @ emb.T
    if mask is not None:
        scores = np.where(mask[None, :] if mask.ndim == 1 else mask, scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("B,N,D,k", [(4, 1000, 64, 10), (1, 256, 32, 5), (8, 2048, 128, 30)])
def test_xla_topk_matches_oracle(rng, B, N, D, k):
    q = rng.normal(size=(B, D)).astype(np.float32)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    vals, idx = dense_topk(jnp.asarray(q), jnp.asarray(emb), k, impl="xla")
    ov, oi = _oracle(q, emb, k)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; compare score sets instead of ids
    np.testing.assert_allclose(
        np.sort(np.asarray(vals), axis=1), np.sort(ov, axis=1), rtol=1e-5, atol=1e-5
    )


def test_topk_with_row_mask(rng):
    B, N, D, k = 3, 500, 32, 8
    q = rng.normal(size=(B, D)).astype(np.float32)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.random(N) > 0.5
    vals, idx = dense_topk(jnp.asarray(q), jnp.asarray(emb), k, mask=jnp.asarray(mask))
    assert mask[np.asarray(idx)].all(), "masked rows must never be returned"
    ov, _ = _oracle(q, emb, k, mask)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-5, atol=1e-5)


def test_topk_per_query_mask(rng):
    B, N, D, k = 2, 300, 16, 5
    q = rng.normal(size=(B, D)).astype(np.float32)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.random((B, N)) > 0.3
    vals, idx = dense_topk(jnp.asarray(q), jnp.asarray(emb), k, mask=jnp.asarray(mask))
    idxn = np.asarray(idx)
    for b in range(B):
        assert mask[b, idxn[b]].all()


@pytest.mark.parametrize("B,N,D,k,tile", [(4, 2048, 128, 16, 512), (2, 1500, 64, 7, 256)])
def test_pallas_topk_matches_xla(rng, B, N, D, k, tile):
    q = rng.normal(size=(B, D)).astype(np.float32)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.random(N) > 0.2
    pv, pi = pallas_dense_topk(
        jnp.asarray(q), jnp.asarray(emb), k, jnp.asarray(mask), tile_n=tile
    )
    xv, xi = dense_topk(jnp.asarray(q), jnp.asarray(emb), k, mask=jnp.asarray(mask), impl="xla")
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5, atol=1e-5)
    # same candidate set up to ties
    assert mask[np.asarray(pi)].all()


def test_topk_k_larger_than_n(rng):
    q = rng.normal(size=(2, 16)).astype(np.float32)
    emb = rng.normal(size=(8, 16)).astype(np.float32)
    vals, idx = dense_topk(jnp.asarray(q), jnp.asarray(emb), 20, impl="xla")
    assert vals.shape == (2, 8)


def test_stream_topk_matches_xla(rng):
    from rag_challenge_2_tpu.ops.pallas_topk_stream import stream_dense_topk

    B, N, D, k = 4, 3000, 128, 9
    q = rng.normal(size=(B, D)).astype(np.float32)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.random(N) > 0.25
    sv, si = stream_dense_topk(jnp.asarray(q), jnp.asarray(emb), k,
                               jnp.asarray(mask), tile_n=512)
    xv, xi = dense_topk(jnp.asarray(q), jnp.asarray(emb), k,
                        mask=jnp.asarray(mask), impl="xla")
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-5)
    assert (np.asarray(si) == np.asarray(xi)).all()
