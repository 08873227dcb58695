"""BM25 CSR kernel vs a pure-numpy oracle over the same tokenisation."""

import numpy as np
import jax.numpy as jnp

from rag_challenge_2_tpu.index import build_corpus_index
from rag_challenge_2_tpu.ops.bm25 import bm25_scores, encode_queries
from rag_challenge_2_tpu.utils import tokenize as tok

K1, B = 1.5, 0.75


def _oracle_scores(chunk_texts, query, vocab_bits):
    """Straightforward BM25 with identical tokenisation + idf formula."""
    docs = [tok.token_ids(t, vocab_bits) for t in chunk_texts]
    n = len(docs)
    avgdl = np.mean([len(d) for d in docs])
    q_ids = tok.token_ids(query, vocab_bits)
    df = {}
    for d in docs:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    out = np.zeros(n)
    for i, d in enumerate(docs):
        for t in q_ids:  # every occurrence of a query term counts once per posting
            tf = d.count(t)
            if tf == 0:
                continue
            idf = np.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            out[i] += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(d) / avgdl))
    return out


def test_bm25_matches_oracle(tiny_corpus):
    idx, meta, *_ = tiny_corpus
    vb = idx.sparse.vocab_bits
    queries = ["金盘科技 营业收入", "页面2 chunk4", "doc0"]
    qt = encode_queries(queries, max_terms=32, vocab_bits=vb)
    scores = np.asarray(bm25_scores(idx.sparse, qt, idx.n_pad, k1=K1, b=B))
    for qi, q in enumerate(queries):
        expected = _oracle_scores(meta.chunk_texts, q, vb)
        np.testing.assert_allclose(scores[qi, : idx.n_chunks], expected, rtol=1e-4, atol=1e-5)
        # padding rows never score
        assert (scores[qi, idx.n_chunks :] == 0).all() or np.allclose(scores[qi, idx.n_chunks:], 0)


def test_bm25_repeated_query_terms_accumulate(tiny_corpus):
    idx, meta, *_ = tiny_corpus
    vb = idx.sparse.vocab_bits
    s1 = np.asarray(bm25_scores(idx.sparse, encode_queries(["营业收入"], 32, vb), idx.n_pad))
    s2 = np.asarray(bm25_scores(idx.sparse, encode_queries(["营业收入 营业收入"], 32, vb), idx.n_pad))
    # rank-bm25 semantics: each query-term occurrence adds its contribution
    np.testing.assert_allclose(s2[0], 2 * s1[0] - np.zeros_like(s1[0]) * 0, rtol=1e-4, atol=1e-5)


def test_bm25_empty_query(tiny_corpus):
    idx, *_ = tiny_corpus
    qt = jnp.full((1, 16), -1, jnp.int32)
    scores = np.asarray(bm25_scores(idx.sparse, qt, idx.n_pad))
    assert np.allclose(scores, 0)
