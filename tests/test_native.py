"""Native C++ CSR builder vs the pure-Python implementation — exact parity
on tokenization, hashing, CSR structure, and query encoding."""

import numpy as np
import pytest

from rag_challenge_2_tpu.utils import tokenize as tok
from rag_challenge_2_tpu.utils.native import (
    build_csr_native,
    native_available,
    tokenize_queries_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)

TEXTS = [
    "金盘科技2024年度营业收入为68.9亿元，同比增长18%",
    "The company's Revenue grew 18.5% to USD 1,234 million in FY2024.",
    "研发费用（R&D expenses）为3.2亿元。详见第58页。",
    "",
    "ａｂｃＡＢＣ１２３",  # full-width → NFKC normalization on the python side
    "混合 mixed tokens 3.14159 and 中文词汇",
]


def _python_csr(texts, vocab_bits):
    """The pure-Python reference: replicate index/build.py's fallback."""
    n = len(texts)
    V = 1 << vocab_bits
    tf_maps = []
    chunk_len = np.zeros(n, np.float32)
    df = np.zeros(V, np.float32)
    for i, t in enumerate(texts):
        ids = tok.token_ids(t, vocab_bits)
        chunk_len[i] = len(ids)
        m = {}
        for x in ids:
            m[x] = m.get(x, 0) + 1
        tf_maps.append(m)
        for x in m:
            df[x] += 1
    indptr = np.zeros(V + 1, np.int64)
    postings = {}
    for i, m in enumerate(tf_maps):
        for t_, c in m.items():
            postings.setdefault(t_, []).append((i, c))
    for t_, lst in postings.items():
        indptr[t_ + 1] = len(lst)
    np.cumsum(indptr, out=indptr)
    nnz = int(indptr[-1])
    chunk_ids = np.zeros(nnz, np.int32)
    tf = np.zeros(nnz, np.float32)
    for t_, lst in postings.items():
        s = indptr[t_]
        for j, (ci, c) in enumerate(lst):
            chunk_ids[s + j] = ci
            tf[s + j] = c
    return indptr, chunk_ids, tf, df, chunk_len


def test_native_csr_matches_python_exactly():
    vb = 14
    nat = build_csr_native(TEXTS, vb)
    assert nat is not None
    n_indptr, n_ids, n_tf, n_df, n_len = nat
    p_indptr, p_ids, p_tf, p_df, p_len = _python_csr(TEXTS, vb)
    np.testing.assert_array_equal(n_indptr, p_indptr)
    np.testing.assert_array_equal(n_ids, p_ids)
    np.testing.assert_array_equal(n_tf, p_tf)
    np.testing.assert_array_equal(n_df, p_df)
    np.testing.assert_array_equal(n_len, p_len)


def test_native_query_tokenizer_matches_python():
    vb = 14
    out = tokenize_queries_native(TEXTS, vb, max_terms=32)
    assert out is not None
    for q, text in enumerate(TEXTS):
        expected = tok.token_ids(text, vb)[:32]
        got = [x for x in out[q] if x >= 0]
        assert got == expected, (text, got[:10], expected[:10])


def test_build_sparse_uses_native(tiny_corpus, monkeypatch):
    # index built through the normal (native) path must equal the python
    # fallback — the fallback is forced by making the native builder
    # report unavailable (the old cap-argument trick still ran native)
    from rag_challenge_2_tpu.index.build import _build_sparse
    import rag_challenge_2_tpu.utils.native as native_mod

    texts = ["营业收入100亿", "净利润 5.1 亿元", "revenue growth"]
    sp_nat = _build_sparse(texts, 1024, 12, None)
    monkeypatch.setattr(native_mod, "build_csr_native", lambda *a, **k: None)
    sp_py = _build_sparse(texts, 1024, 12, None)
    np.testing.assert_array_equal(np.asarray(sp_nat.indptr), np.asarray(sp_py.indptr))
    np.testing.assert_array_equal(
        np.asarray(sp_nat.chunk_ids), np.asarray(sp_py.chunk_ids)
    )
    np.testing.assert_allclose(np.asarray(sp_nat.tf), np.asarray(sp_py.tf))


def test_native_speedup_at_scale():
    import time

    texts = [f"金盘科技第{i}页 营业收入{i}亿元 增长{i % 30}% revenue item{i}" for i in range(3000)]
    t0 = time.perf_counter()
    nat = build_csr_native(texts, 16)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _python_csr(texts, 16)
    t_py = time.perf_counter() - t0
    assert nat is not None
    assert t_nat < t_py, (t_nat, t_py)
