"""PartialReduce two-stage top-k (ops/partial_topk.py).

The bin LAYOUT is backend behaviour that only the on-TPU probe can
verify; these tests mock ``approx_max_k`` with exact strided-bin
references (contiguous AND parity-interleaved, the two layouts measured
on v5e) so the exactness machinery (stage-2 bin selection, candidate
enumeration, tails, masks, tie-breaks) is validated on CPU.  On backends
whose real layout fails the probe (this CPU), the public entry points
must fall back and stay exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_challenge_2_tpu.ops.partial_topk import (
    BinModel,
    partial_from_scores,
    partial_int8_topk,
    probe_bin_model,
)
from rag_challenge_2_tpu.ops.topk import large_topk_from_scores


def _make_model(n, k=8, width=4, stride=1):
    """Synthetic lane-striped arithmetic-progression layout covering
    [0, n) exactly — stride 1 = contiguous row blocks, stride 2 = parity
    superblocks (both measured on v5e)."""
    n_rows = -(-n // 128)
    rows_per_super = stride * width
    n_super = -(-n_rows // rows_per_super)
    L = n_super * stride * 128
    left_row = np.empty(L, np.int64)
    n_valid = np.empty(L, np.int64)
    for s in range(L):
        rb = s // 128
        sup, ph = rb // stride, rb % stride
        first = sup * rows_per_super + ph
        members = [first + stride * t for t in range(width)
                   if first + stride * t < n_rows]
        # drop rows whose lane exceeds n in the ragged last row
        lane = s % 128
        members = [r for r in members if r * 128 + lane < n]
        left_row[s] = members[0] if members else 0
        n_valid[s] = len(members)
    return BinModel(
        n=n, k=k, recall_target=0.95, n_bins=L, stride=stride, width=width,
        left_row=left_row.astype(np.int32), n_valid=n_valid.astype(np.int32),
    )


def _mock_approx(model):
    """Exact bin-max reference for the synthetic layout."""

    def fake(operand, k, recall_target=0.95, aggregate_to_topk=True, **kw):
        assert not aggregate_to_topk
        B = operand.shape[0]
        mem = model.members()                                  # [L, W]
        safe = jnp.asarray(np.maximum(mem, 0))
        vals = jnp.where(
            jnp.asarray(mem >= 0)[None],
            operand[:, safe.reshape(-1)].reshape(B, *mem.shape), -3.0e38,
        )
        m = jnp.max(vals, axis=2)
        am = jnp.argmax(vals, axis=2)
        idx = jnp.take_along_axis(jnp.asarray(np.maximum(mem, 0))[None], am[:, :, None],
                                  axis=2)[:, :, 0]
        return m, idx.astype(jnp.int32)

    return fake


def test_members_partition():
    for n, stride, width in [(1024, 1, 4), (1000, 2, 4), (4096 + 37, 2, 8)]:
        m = _make_model(n, stride=stride, width=width)
        flat = m.members()
        flat = flat[flat >= 0]
        assert sorted(flat.tolist()) == list(range(n))


@pytest.mark.parametrize("n,stride", [(1024, 1), (1000, 2), (4096 + 37, 2)])
def test_partial_from_scores_exact(rng, n, stride, monkeypatch):
    model = _make_model(n, stride=stride)
    monkeypatch.setattr(jax.lax, "approx_max_k", _mock_approx(model))
    scores = jnp.asarray(rng.normal(size=(5, n)).astype(np.float32))
    xv, xi = jax.lax.top_k(scores, 8)
    pv, pi = partial_from_scores(scores, 8, model)
    np.testing.assert_array_equal(np.asarray(xv), np.asarray(pv))
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(pi))


def test_partial_from_scores_ties_in_candidates(rng, monkeypatch):
    """Exact value ties whose members all reach the candidate set must
    break to the LOWEST row, exactly like lax.top_k."""
    n = 2048
    model = _make_model(n, stride=2)
    monkeypatch.setattr(jax.lax, "approx_max_k", _mock_approx(model))
    s = rng.normal(size=(2, n)).astype(np.float32)
    s[0, 700] = s[0, 100] = s[0, 1500] = 7.5   # three-way exact tie
    sj = jnp.asarray(s)
    xv, xi = jax.lax.top_k(sj, 6)
    pv, pi = partial_from_scores(sj, 6, model)
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(xv), np.asarray(pv))


def test_partial_from_scores_all_topk_in_one_bin(rng, monkeypatch):
    """Adversarial clustering: every true top-k member lives in ONE bin."""
    n = 4096
    model = _make_model(n, width=8)
    monkeypatch.setattr(jax.lax, "approx_max_k", _mock_approx(model))
    s = rng.normal(size=(2, n)).astype(np.float32) * 0.01
    mem = model.members()
    bin_id = 200
    rows = mem[bin_id][mem[bin_id] >= 0]
    s[0, rows] = 50 + np.arange(len(rows))
    sj = jnp.asarray(s)
    xv, xi = jax.lax.top_k(sj, len(rows))
    pv, pi = partial_from_scores(sj, len(rows), model)
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(pi))


def test_partial_int8_topk_bit_identical(rng, monkeypatch):
    from rag_challenge_2_tpu.ops.quant import int8_scores, quantize_rows

    n, d, k = 2000, 32, 9
    model = _make_model(n, stride=2)
    monkeypatch.setattr(jax.lax, "approx_max_k", _mock_approx(model))
    q = rng.normal(size=(4, d)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x[1500] = x[40]                       # exact post-quantization tie
    emb8, scale = quantize_rows(jnp.asarray(x))
    s = np.asarray(int8_scores(jnp.asarray(q), emb8, scale))
    oi = np.argsort(-s, axis=1, kind="stable")[:, :k]
    pv, pi = partial_int8_topk(jnp.asarray(q), emb8, scale, k, model)
    np.testing.assert_array_equal(np.asarray(pi), oi)
    np.testing.assert_allclose(
        np.asarray(pv), np.take_along_axis(s, oi, axis=1), rtol=1e-6
    )


@pytest.mark.parametrize("mask_kind", ["row", "per_query"])
def test_partial_int8_topk_masks(rng, monkeypatch, mask_kind):
    from rag_challenge_2_tpu.ops.quant import int8_scores, quantize_rows

    n, d, k = 1500, 16, 5
    model = _make_model(n, stride=2)
    monkeypatch.setattr(jax.lax, "approx_max_k", _mock_approx(model))
    q = rng.normal(size=(3, d)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    emb8, scale = quantize_rows(jnp.asarray(x))
    mask = (
        rng.random(n) > 0.4 if mask_kind == "row" else rng.random((3, n)) > 0.4
    )
    s = np.asarray(int8_scores(jnp.asarray(q), emb8, scale))
    s = np.where(mask if mask.ndim == 2 else mask[None, :], s, -3.0e38)
    oi = np.argsort(-s, axis=1, kind="stable")[:, :k]
    pv, pi = partial_int8_topk(
        jnp.asarray(q), emb8, scale, k, model, mask=jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(pi), oi)


def test_probe_returns_none_on_unverified_backend():
    """This CPU backend's PartialReduce layout must fail the probe's
    partition verification → None → public entry points stay exact via
    the fallback routes."""
    probe_bin_model.cache_clear()
    assert probe_bin_model(3_000_000, 10) is None
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(3, 4096)).astype(np.float32))
    xv, xi = jax.lax.top_k(s, 7)
    lv, li = large_topk_from_scores(s, 7)
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(xv), np.asarray(lv))
    probe_bin_model.cache_clear()
