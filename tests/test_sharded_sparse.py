"""Row-range-sharded BM25 vs the single-device kernel (8-device CPU mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_challenge_2_tpu.index import build_corpus_index
from rag_challenge_2_tpu.index.schema import ShardedSparseIndex
from rag_challenge_2_tpu.ops.bm25 import bm25_topk, encode_queries
from rag_challenge_2_tpu.parallel.mesh import make_mesh
from rag_challenge_2_tpu.parallel.sharded_sparse import (
    shard_sparse_index,
    sharded_bm25_topk,
)

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _setup(tiny_corpus, n_shards, mesh=None):
    idx, meta, reports, embs = tiny_corpus
    ss = shard_sparse_index(idx.sparse, n_shards, mesh=mesh)
    vb = idx.sparse.vocab_bits
    qt = encode_queries(["金盘科技 营业收入", "页面2 chunk4"], 32, vb)
    doc_ids = np.asarray(idx.doc_id)
    valid = np.asarray(idx.valid)
    M = 3
    dm = jnp.asarray(np.stack([valid & (doc_ids == d) for d in range(M)]))
    slot = np.full((idx.n_pad,), M, np.int32)
    for d in range(M):
        slot[valid & (doc_ids == d)] = d
    return idx, ss, qt, dm, jnp.asarray(slot)


def test_shard_partition_covers_all_postings(tiny_corpus):
    """Every posting lands on exactly one shard; per-shard counts sum to
    the corpus counts and the global stats are untouched."""
    idx, meta, *_ = tiny_corpus
    ss = shard_sparse_index(idx.sparse, 4)
    assert ss.n_shards == 4
    nnz = int(np.asarray(idx.sparse.indptr)[-1])
    per_shard_nnz = np.asarray(ss.indptr)[:, -1]
    assert per_shard_nnz.sum() == nnz
    # per-term totals match the corpus CSR
    corpus_counts = np.diff(np.asarray(idx.sparse.indptr))
    shard_counts = np.stack([np.diff(np.asarray(ss.indptr)[s]) for s in range(4)])
    np.testing.assert_array_equal(shard_counts.sum(0), corpus_counts)
    np.testing.assert_array_equal(np.asarray(ss.df), np.asarray(idx.sparse.df))
    # shard s only holds rows of its range
    rows_per = -(-idx.n_pad // 4)
    for s in range(4):
        n_s = int(per_shard_nnz[s])
        ids_s = np.asarray(ss.chunk_ids)[s, :n_s]
        assert ((ids_s // rows_per).clip(max=3) == s).all()


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_bm25_matches_single_device(tiny_corpus, n_shards):
    idx, ss, qt, dm, slot = _setup(tiny_corpus, n_shards)
    bv, br, bok = bm25_topk(idx.sparse, qt, dm, 5, row_slot=slot)
    sv, sr, sok = sharded_bm25_topk(ss, qt, dm, 5, row_slot=slot)
    np.testing.assert_array_equal(np.asarray(bok), np.asarray(sok))
    np.testing.assert_array_equal(np.asarray(br), np.asarray(sr))
    np.testing.assert_allclose(np.asarray(bv), np.asarray(sv), rtol=1e-4, atol=1e-5)


def test_sharded_bm25_scan_path_no_row_slot(tiny_corpus):
    idx, ss, qt, dm, slot = _setup(tiny_corpus, 4)
    bv, br, bok = bm25_topk(idx.sparse, qt, dm, 5)
    sv, sr, sok = sharded_bm25_topk(ss, qt, dm, 5)
    np.testing.assert_array_equal(np.asarray(bok), np.asarray(sok))
    np.testing.assert_array_equal(np.asarray(br), np.asarray(sr))
    np.testing.assert_allclose(np.asarray(bv), np.asarray(sv), rtol=1e-4, atol=1e-5)


@needs_devices
def test_engine_hybrid_with_fully_sharded_index(tiny_corpus, rng):
    """The WHOLE hybrid graph (dense + BM25 + fusion) with BOTH the dense
    matrix row-sharded and the CSR row-range-sharded over the mesh —
    the multi-chip configuration of BASELINE config 5 — must reproduce the
    single-device results."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_challenge_2_tpu.retrieval.engine import QueryEngine, SearchConfig

    idx, meta, reports, embs = tiny_corpus
    eng_plain = QueryEngine(idx, meta)
    q = embs[0][5][None, :].astype(np.float32)
    cfg = SearchConfig(method="basic", top_k=5, top_n=10, use_bm25=True)
    base = eng_plain.materialize(
        eng_plain.search(q, "金盘科技", cfg=cfg, query_texts=["营业收入"]), cfg
    )

    mesh = make_mesh({"data": 8})
    sharded_idx = dataclasses.replace(
        idx,
        emb=jax.device_put(idx.emb, NamedSharding(mesh, P("data", None))),
        valid=jax.device_put(idx.valid, NamedSharding(mesh, P("data"))),
        sparse=shard_sparse_index(idx.sparse, 8, mesh=mesh),
    )
    eng_sharded = QueryEngine(sharded_idx, meta)
    got = eng_sharded.materialize(
        eng_sharded.search(q, "金盘科技", cfg=cfg, query_texts=["营业收入"]), cfg
    )
    assert [r["rep_row"] for r in got] == [r["rep_row"] for r in base]
    for a, b in zip(got, base):
        assert abs(a["distance"] - b["distance"]) < 1e-4
        assert a["method_count"] == b["method_count"]
