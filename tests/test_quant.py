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
