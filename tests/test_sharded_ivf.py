"""Distributed IVF (parallel/sharded_ivf) on the 8-device virtual CPU mesh:
merge machinery must be bit-exact vs a host-sequential per-shard replay,
recall must beat the matched single-shard IVF, and routing must hold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_challenge_2_tpu.index.ivf import build_ivf, ivf_search, quantize_ivf
from rag_challenge_2_tpu.ops.topk import dense_topk
from rag_challenge_2_tpu.parallel.mesh import make_mesh
from rag_challenge_2_tpu.parallel.sharded_ivf import (
    build_sharded_ivf,
    sharded_ivf_search,
)

S = 4
N, D, K_CLUSTERS = 2048, 32, 8


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.normal(size=(5, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(emb), jnp.asarray(q)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"data": S})


def _replay_sequential(emb, q, k, nprobe, quantize=False):
    """Host-sequential reference: per-shard build_ivf + ivf_search, merged
    with the same (-val, lower-global-row) order the device merge uses."""
    rows_per_shard = -(-emb.shape[0] // S)
    all_v, all_r = [], []
    for s in range(S):
        lo, hi = s * rows_per_shard, min(emb.shape[0], (s + 1) * rows_per_shard)
        ivf = build_ivf(emb[lo:hi], n_clusters=K_CLUSTERS, iters=10, seed=s)
        if quantize:
            ivf = quantize_ivf(ivf)
        v, r = ivf_search(ivf, q, min(k, hi - lo), nprobe=nprobe)
        all_v.append(np.asarray(v))
        all_r.append(np.where(np.asarray(r) >= 0, np.asarray(r) + lo, -1))
    av = np.concatenate(all_v, axis=1)
    ai = np.concatenate(all_r, axis=1)
    out_v, out_r = [], []
    for b in range(q.shape[0]):
        order = np.lexsort((np.where(ai[b] >= 0, ai[b], 2**30), -av[b]))[:k]
        out_v.append(av[b][order])
        out_r.append(ai[b][order])
    return np.stack(out_v), np.stack(out_r)


def test_sharded_matches_sequential_replay(corpus, mesh):
    emb, q = corpus
    k, nprobe = 10, 2
    sivf = build_sharded_ivf(emb, mesh, n_clusters=K_CLUSTERS, seed=0)
    vals, rows = sharded_ivf_search(sivf, q, k, mesh, nprobe=nprobe)
    want_v, want_r = _replay_sequential(emb, q, k, nprobe)
    assert np.asarray(rows).tolist() == want_r.tolist()
    np.testing.assert_allclose(np.asarray(vals), want_v, rtol=1e-5, atol=1e-5)


def test_sharded_recall_beats_matched_single(corpus, mesh):
    emb, q = corpus
    k = 10
    _, oracle = dense_topk(q, emb, k, impl="xla")
    oracle = np.asarray(oracle)

    sivf = build_sharded_ivf(emb, mesh, n_clusters=K_CLUSTERS, seed=0)
    _, rows_sh = sharded_ivf_search(sivf, q, k, mesh, nprobe=2)

    single = build_ivf(emb, n_clusters=K_CLUSTERS, iters=10, seed=0)
    _, rows_1 = ivf_search(single, q, k, nprobe=2)

    def recall(rows):
        rows = np.asarray(rows)
        return np.mean([
            len(set(rows[b].tolist()) & set(oracle[b].tolist())) / k
            for b in range(q.shape[0])
        ])

    r_sh, r_1 = recall(rows_sh), recall(rows_1)
    # S shards probe S·nprobe lists total → recall must not fall below the
    # single index at the same nprobe (usually strictly above)
    assert r_sh >= r_1 - 1e-9, (r_sh, r_1)
    assert r_sh > 0.5


def test_sharded_int8_store(corpus, mesh):
    emb, q = corpus
    k = 10
    sivf = build_sharded_ivf(
        emb, mesh, n_clusters=K_CLUSTERS, seed=0, quantize=True
    )
    assert sivf.emb_perm.dtype == jnp.int8 and sivf.row_scale is not None
    vals, rows = sharded_ivf_search(sivf, q, k, mesh, nprobe=2)
    want_v, want_r = _replay_sequential(emb, q, k, nprobe=2, quantize=True)
    assert np.asarray(rows).tolist() == want_r.tolist()
    np.testing.assert_allclose(np.asarray(vals), want_v, rtol=1e-4, atol=1e-4)


def test_sharded_window_routing(corpus, mesh):
    """Global contiguous row-range routing: results stay inside the window
    and match an exact masked scan's candidate set on the probed lists."""
    emb, q = corpus
    k, nprobe = 10, 8  # probe everything → exact within the window
    sivf = build_sharded_ivf(emb, mesh, n_clusters=K_CLUSTERS, seed=0)
    ws = jnp.full((q.shape[0],), 512, jnp.int32)
    wl = jnp.full((q.shape[0],), 1024, jnp.int32)   # spans shards 1 and 2
    vals, rows = sharded_ivf_search(
        sivf, q, k, mesh, nprobe=nprobe, win_start=ws, win_len=wl
    )
    rows = np.asarray(rows)
    live = rows >= 0
    assert live.any()
    assert ((rows[live] >= 512) & (rows[live] < 1536)).all()
    # nprobe = K probes every list → exact: equals the masked dense top-k
    mask = np.zeros((N,), bool)
    mask[512:1536] = True
    _, want = dense_topk(q, emb, k, mask=jnp.asarray(mask), impl="xla")
    assert rows.tolist() == np.asarray(want).tolist()


def test_too_few_rows_raises(mesh):
    with pytest.raises(ValueError, match="cannot shard"):
        build_sharded_ivf(jnp.zeros((2, 8)), mesh, n_clusters=1)


def test_narrow_probe_window(mesh):
    """k exceeding nprobe·max_list: ivf_search returns min(k, P·W) columns
    per shard, and the merge must clamp its reshape to that (regression —
    this configuration used to crash with a reshape TypeError)."""
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(256, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = jnp.asarray(emb[:3] + 0.01)
    sivf = build_sharded_ivf(jnp.asarray(emb), mesh, n_clusters=32, seed=0)
    k = 10
    assert 1 * sivf.max_list < k  # the regression's precondition
    vals, rows = sharded_ivf_search(sivf, q, k, mesh, nprobe=1)
    assert vals.shape == (3, k) and rows.shape == (3, k)
    rows = np.asarray(rows)
    vals = np.asarray(vals)
    # every query probes 1 list on each of 4 shards → ≥4 real hits, the
    # self row among them; padding slots are (-inf, -1)
    for b in range(3):
        real = rows[b] >= 0
        assert real.sum() >= 4
        assert b in rows[b][real]
        assert np.all(np.diff(vals[b][real]) <= 1e-6)
        assert np.all(rows[b][~real] == -1)


def test_engine_hybrid_on_fully_sharded_index(mesh, rng):
    """The FULL engine graph (probe candidates + BM25 + fusion) over a
    row-sharded corpus + sharded CSR + ShardedIVF: at nprobe = K the
    probes are exact, so fused results must equal the unsharded engine's
    exact dense path — the config-5 pod-serving graph end to end."""
    import dataclasses as dc
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_reports

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_challenge_2_tpu.index import build_corpus_index
    from rag_challenge_2_tpu.parallel.sharded_sparse import shard_sparse_index
    from rag_challenge_2_tpu.retrieval.engine import QueryEngine, SearchConfig

    reports, embs = make_reports(rng)
    idx, meta = build_corpus_index(reports, embs, vocab_bits=12)

    base_eng = QueryEngine(idx, meta)
    q = np.concatenate(embs)[7][None, :].astype(np.float32)
    cfg_exact = SearchConfig(method="basic", top_k=5, top_n=10, use_bm25=True)
    base = base_eng.materialize(
        base_eng.search(q, "金盘科技", cfg=cfg_exact, query_texts=["营业收入"]),
        cfg_exact,
    )

    kc = 2
    sivf = build_sharded_ivf(idx.emb, mesh, n_clusters=kc, iters=5,
                             valid=idx.valid)
    sharded_idx = dc.replace(
        idx,
        emb=jax.device_put(idx.emb, NamedSharding(mesh, P("data", None))),
        valid=jax.device_put(idx.valid, NamedSharding(mesh, P("data"))),
        sparse=shard_sparse_index(idx.sparse, S, mesh=mesh),
    )
    eng = QueryEngine(sharded_idx, meta, ivf=sivf)
    cfg_ivf = dc.replace(cfg_exact, use_ivf=True, ivf_nprobe=kc)
    got = eng.materialize(
        eng.search(q, "金盘科技", cfg=cfg_ivf, query_texts=["营业收入"]),
        cfg_ivf,
    )
    assert [r["rep_row"] for r in got] == [r["rep_row"] for r in base]
    for a, b in zip(got, base):
        assert abs(a["distance"] - b["distance"]) < 1e-4
        assert a["method_count"] == b["method_count"]
