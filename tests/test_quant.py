"""int8 quantized row store: scan + IVF probe (ops/quant.py, index/ivf.py).

Equal-memory rationale in BASELINE.md: the reference serves f32 FAISS
flat-IP (reference src/ingestion.py:79-84); int8 rows hold 4× the corpus
in the same bytes.
"""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def rng():
    # local rng: the session fixture's draw order must stay stable for
    # other modules (kmeans recovery asserts on its specific draws)
    return np.random.default_rng(7)

from rag_challenge_2_tpu.ops.quant import int8_topk, quantize_rows
from rag_challenge_2_tpu.ops.topk import dense_topk


def clustered(rng, n, d, centers=32, noise=0.3):
    c = rng.normal(size=(centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = c[rng.integers(0, centers, n)] + noise / np.sqrt(d) * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_quantize_roundtrip_error_bound(rng):
    x = rng.normal(size=(64, 128)).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (64,)
    back = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    # symmetric rounding: |err| ≤ scale/2 per element
    assert np.all(np.abs(back - x) <= np.asarray(s)[:, None] / 2 + 1e-7)


def test_quantize_zero_rows_score_zero(rng):
    x = np.zeros((4, 32), np.float32)
    x[0] = rng.normal(size=32)
    q, s = quantize_rows(jnp.asarray(x))
    assert float(s[1]) == 0.0
    vals, idx = int8_topk(jnp.asarray(x[:1]), q, s, k=4)
    got = np.asarray(vals)[0]
    # zero rows tie at exactly 0 — never above the real row's score
    assert np.asarray(idx)[0, 0] == 0 and np.all(got[1:] == 0.0)


def test_int8_topk_exact_on_representable(rng):
    # rows already on the int8 grid → quantization is lossless → identical
    # ranking to the f32 exact oracle
    grid = rng.integers(-127, 128, size=(200, 64)).astype(np.float32)
    grid[:, 0] = 127  # anchor max|row| so scale is exactly 0.01 per row
    scale = 0.01
    x = grid * scale
    qgrid = rng.integers(-127, 128, size=(5, 64)).astype(np.float32)
    qgrid[:, 0] = 127
    q = qgrid * 0.02
    qi, s = quantize_rows(jnp.asarray(x))
    v8, i8 = int8_topk(jnp.asarray(q), qi, s, k=10)
    vf, if_ = dense_topk(jnp.asarray(q), jnp.asarray(x), 10, impl="xla")
    # integer dot products can tie → order within ties may differ; the
    # score values and the retrieved sets must match exactly
    np.testing.assert_allclose(np.asarray(v8), np.asarray(vf), rtol=2e-5, atol=1e-6)
    for a, b in zip(np.asarray(i8), np.asarray(if_)):
        assert len(set(a) & set(b)) >= 9  # ≤1 swap at the k-boundary tie


def test_int8_topk_recall_vs_f32(rng):
    x = clustered(rng, 4096, 256)
    q = clustered(rng, 32, 256)
    qi, s = quantize_rows(jnp.asarray(x))
    _, i8 = int8_topk(jnp.asarray(q), qi, s, k=10)
    _, if_ = dense_topk(jnp.asarray(q), jnp.asarray(x), 10, impl="xla")
    got, want = np.asarray(i8), np.asarray(if_)
    recall = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(32)])
    assert recall >= 0.9, recall


def test_int8_topk_mask_routing(rng):
    x = clustered(rng, 512, 64)
    q = clustered(rng, 3, 64)
    qi, s = quantize_rows(jnp.asarray(x))
    mask = np.zeros((512,), bool)
    mask[100:200] = True
    _, idx = int8_topk(jnp.asarray(q), qi, s, k=5, mask=jnp.asarray(mask))
    assert np.all((np.asarray(idx) >= 100) & (np.asarray(idx) < 200))


@pytest.mark.parametrize("nprobe", [4])
def test_ivf_int8_probe_recall(rng, nprobe):
    from rag_challenge_2_tpu.index.ivf import build_ivf, ivf_search, quantize_ivf

    x = clustered(rng, 8192, 128, centers=64)
    q = clustered(rng, 16, 128, centers=64)
    ivf = build_ivf(jnp.asarray(x), n_clusters=64, iters=5)
    ivf8 = quantize_ivf(ivf)
    assert ivf8.emb_perm.dtype == jnp.int8 and ivf8.row_scale is not None

    _, rows_f = ivf_search(ivf, jnp.asarray(q), 10, nprobe=nprobe)
    _, rows_8 = ivf_search(ivf8, jnp.asarray(q), 10, nprobe=nprobe)
    f, e = np.asarray(rows_f), np.asarray(rows_8)
    overlap = np.mean([
        len(set(f[i]) & set(e[i])) / 10 for i in range(len(f))
    ])
    assert overlap >= 0.85, overlap  # int8 probe ≈ f32 probe

    # routing mask still honoured through the quantized path
    mask = np.zeros((8192,), bool)
    mask[:4096] = True
    _, rows_m = ivf_search(ivf8, jnp.asarray(q), 10, nprobe=nprobe,
                           mask=jnp.asarray(mask))
    got = np.asarray(rows_m)
    assert np.all((got < 4096) | (got == -1))


def test_engine_search_int8_index(tiny_corpus):
    """The full engine graph runs on a quantized CorpusIndex: basic + BM25
    fusion + traversal all dispatch on emb.dtype."""
    import dataclasses
    import jax.numpy as jnp

    from rag_challenge_2_tpu.index.store import quantize_index
    from rag_challenge_2_tpu.retrieval.engine import QueryEngine, SearchConfig

    idx, meta, reports, embs = tiny_corpus
    idx8 = quantize_index(idx)
    assert idx8.emb.dtype == jnp.int8 and idx8.emb_scale is not None

    eng = QueryEngine(idx, meta)
    eng8 = QueryEngine(idx8, meta)
    q = np.asarray(embs[0][:1])
    for method in ("basic", "hybrid_expansion"):
        cfg = SearchConfig(method=method, top_n=5, top_k=8, max_hops=2,
                           neighbor_k=4, use_bm25=(method == "basic"))
        r_f = eng.materialize(eng.search(q, "金盘科技", "营业收入2023年",
                                         cfg=cfg, query_texts=["营业收入"]), cfg)
        r_8 = eng8.materialize(eng8.search(q, "金盘科技", "营业收入2023年",
                                           cfg=cfg, query_texts=["营业收入"]), cfg)
        top_f = {c["rep_row"] for c in r_f[:5]}
        top_8 = {c["rep_row"] for c in r_8[:5]}
        assert len(top_f & top_8) >= 4, (method, top_f, top_8)


def test_index_int8_save_load_roundtrip(tiny_corpus, tmp_path):
    import jax.numpy as jnp

    from rag_challenge_2_tpu.index import load_index, save_index
    from rag_challenge_2_tpu.index.store import quantize_index

    idx, meta, _, _ = tiny_corpus
    idx8 = quantize_index(idx)
    p = tmp_path / "ix8.npz"
    save_index(p, idx8, meta)
    idx2, meta2 = load_index(p)
    assert idx2.emb.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(idx2.emb), np.asarray(idx8.emb))
    np.testing.assert_allclose(np.asarray(idx2.emb_scale),
                               np.asarray(idx8.emb_scale), rtol=1e-6)


def test_residual_quantization_shrinks_error(rng):
    """Centroid-residual int8: reconstruction error must shrink by the
    |residual|/|row| ratio vs plain per-row int8 on clustered rows."""
    from rag_challenge_2_tpu.ops.kmeans import kmeans
    from rag_challenge_2_tpu.ops.quant import quantize_rows_residual

    x = clustered(rng, 2000, 128, centers=16, noise=0.3)
    cent, _ = kmeans(jnp.asarray(x), 16, iters=6, seed=0)
    q, s, a = quantize_rows_residual(jnp.asarray(x), cent)
    assert q.dtype == jnp.int8 and a.dtype == jnp.int32

    back = np.asarray(cent)[np.asarray(a)] + np.asarray(q, np.float32) * np.asarray(s)[:, None]
    # reconstruction stays within the per-row quantization step ...
    assert np.all(np.abs(back - x) <= np.asarray(s)[:, None] / 2 + 1e-7)
    # ... and the MEAN step (the score-noise driver) shrinks ≥2× vs plain
    # int8 (max is dominated by cluster-boundary rows and shrinks less)
    _, s0 = quantize_rows(jnp.asarray(x))
    ratio = float(np.asarray(s).mean() / np.asarray(s0).mean())
    assert ratio < 0.5, ratio


def test_residual_topk_beats_plain_int8_recall(rng):
    """The product claim: residual int8 exact scan recovers strictly more
    of the f32 oracle's top-10 than plain int8 on a tie-dense corpus."""
    from rag_challenge_2_tpu.ops.kmeans import kmeans
    from rag_challenge_2_tpu.ops.quant import (
        int8_residual_topk, quantize_rows_residual)

    # tight clusters -> near-ties inside a cluster -> quantization flips
    x = clustered(rng, 5000, 256, centers=8, noise=0.08)
    qv = x[rng.integers(0, 5000, 64)] + 0.02 / np.sqrt(256) * rng.normal(
        size=(64, 256)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)

    _, oracle = dense_topk(jnp.asarray(qv), jnp.asarray(x), 10, impl="xla")
    oracle = np.asarray(oracle)

    cent, _ = kmeans(jnp.asarray(x), 8, iters=8, seed=0)
    r8, rs, ra = quantize_rows_residual(jnp.asarray(x), cent)
    _, ir = int8_residual_topk(jnp.asarray(qv), r8, rs, ra, cent, 10)
    p8, ps = quantize_rows(jnp.asarray(x))
    _, ip = int8_topk(jnp.asarray(qv), p8, ps, 10)

    def recall(got):
        got = np.asarray(got)
        return np.mean([len(set(got[i]) & set(oracle[i])) / 10
                        for i in range(64)])

    # seeded draw: measured 0.72 residual vs 0.38 plain — the corpus is
    # deliberately tie-dense (noise 0.08, query 0.02) so plain int8
    # collapses; the claim is the ORDERING plus a wide margin
    r_res, r_plain = recall(ir), recall(ip)
    assert r_res >= r_plain + 0.15, (r_res, r_plain)
    assert r_res >= 0.6, r_res


def test_residual_topk_respects_mask_and_matches_scores(rng):
    from rag_challenge_2_tpu.ops.kmeans import kmeans
    from rag_challenge_2_tpu.ops.quant import (
        int8_residual_scores, int8_residual_topk, quantize_rows_residual)

    x = clustered(rng, 300, 64, centers=4)
    qv = jnp.asarray(x[:5])
    cent, _ = kmeans(jnp.asarray(x), 4, iters=4, seed=0)
    q8, s, a = quantize_rows_residual(jnp.asarray(x), cent)
    mask = np.zeros(300, bool)
    mask[100:200] = True
    # query_2pass=False: int8_residual_scores is the 1-pass definition,
    # so exact value parity only holds against the 1-pass scan
    vals, idx = int8_residual_topk(qv, q8, s, a, cent, 7,
                                   mask=jnp.asarray(mask),
                                   query_2pass=False)
    idx = np.asarray(idx)
    assert ((idx >= 100) & (idx < 200)).all()
    scores = np.asarray(int8_residual_scores(qv, q8, s, a, cent))
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(scores[:, 100:200], axis=1)[:, ::-1][:, :7],
        rtol=1e-5, atol=1e-5)


def test_query_2pass_near_exact(rng):
    """Two-level query quantization must reconstruct q to ~1e-5 and the
    2-pass blocked scan must outrank the 1-pass on tie-dense corpora."""
    from rag_challenge_2_tpu.ops.quant import quantize_query_2pass

    q = rng.normal(size=(8, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q8, s_hi, s_lo = quantize_query_2pass(jnp.asarray(q))
    assert q8.shape == (16, 128) and q8.dtype == jnp.int8
    back = (np.asarray(q8[:8], np.float32) * np.asarray(s_hi)[:, None]
            + np.asarray(q8[8:], np.float32) * np.asarray(s_lo)[:, None])
    assert np.abs(back - q).max() < 5e-5


def test_residual_topk_2pass_and_approx_paths(rng):
    from rag_challenge_2_tpu.ops.kmeans import kmeans
    from rag_challenge_2_tpu.ops.quant import (
        int8_residual_approx_topk, int8_residual_topk,
        quantize_rows_residual)

    x = clustered(rng, 3000, 128, centers=8, noise=0.15)
    qv = jnp.asarray(x[:16])
    cent, _ = kmeans(jnp.asarray(x), 8, iters=4, seed=0)
    q8, s, a = quantize_rows_residual(jnp.asarray(x), cent)
    v1, i1 = int8_residual_topk(qv, q8, s, a, cent, 10, query_2pass=False)
    v2, i2 = int8_residual_topk(qv, q8, s, a, cent, 10, query_2pass=True)
    # 2-pass must agree with 1-pass at least on the self-hit
    assert np.array_equal(np.asarray(i1)[:, 0], np.arange(16))
    assert np.array_equal(np.asarray(i2)[:, 0], np.arange(16))
    # approx tier returns valid rows with large top-10 overlap vs exact
    va, ia = int8_residual_approx_topk(qv, q8, s, a, cent, 10,
                                       recall_target=0.95)
    ov = np.mean([
        len(set(np.asarray(ia)[i]) & set(np.asarray(i2)[i])) / 10
        for i in range(16)
    ])
    assert ov >= 0.9, ov


def test_residual_topk_rescored_matches_exact_2pass(rng):
    """The two-stage tier (approx candidates + exact 2-pass rerank) must
    reproduce the exact 2-pass scan's top-k on a clustered corpus, and
    honour routing masks."""
    from rag_challenge_2_tpu.ops.kmeans import kmeans
    from rag_challenge_2_tpu.ops.quant import (
        int8_residual_topk, int8_residual_topk_rescored,
        quantize_rows_residual)

    x = clustered(rng, 4000, 128, centers=8, noise=0.2)
    qv = jnp.asarray(x[:16])
    cent, _ = kmeans(jnp.asarray(x), 8, iters=4, seed=0)
    q8, s, a = quantize_rows_residual(jnp.asarray(x), cent)
    ve, ie = int8_residual_topk(qv, q8, s, a, cent, 10, query_2pass=True)
    vr, ir = int8_residual_topk_rescored(qv, q8, s, a, cent, 10, k_cand=48)
    ov = np.mean([
        len(set(np.asarray(ir)[i]) & set(np.asarray(ie)[i])) / 10
        for i in range(16)
    ])
    assert ov >= 0.95, ov

    mask = np.zeros(4000, bool)
    mask[1000:2000] = True
    _, im = int8_residual_topk_rescored(qv, q8, s, a, cent, 5, k_cand=16,
                                        mask=jnp.asarray(mask))
    got = np.asarray(im)
    assert np.all(((got >= 1000) & (got < 2000)) | (got == -1))
