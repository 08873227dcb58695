"""Profile the probe-served 10M hybrid: where do its ~5.2 ms/call go?

Builds the same cluster-ordered 10M int8 corpus as bench.bench_ivf_10m,
then times the components separately on the SAME data:
  1. the full routed dense+BM25+fusion graph (the 765 qps headline)
  2. dense probes only (use_bm25 off)
  3. ivf_search alone at the engine's shapes (pair_doc mode)
  4. the raw Pallas span kernel at the same span count/width
  5. BM25 alone (use_bm25 on, method basic, probes off = exact scan? no -
     measured as full minus dense by differencing instead)

Usage: python _exp_probe_profile.py [N C]   (defaults 10M / 500k)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rag_challenge_2_tpu.index.ivf import (
    build_ivf_streaming, cluster_order_index, ivf_search,
)
from rag_challenge_2_tpu.index.schema import CorpusIndex, SparseIndex
from rag_challenge_2_tpu.ops.pallas_bm25 import dma_slack
from rag_challenge_2_tpu.ops.pallas_ivf import probe_span_scores
from rag_challenge_2_tpu.retrieval.engine import SearchConfig, search_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
D, N_CENTERS, NQ = 1024, 4096, 127

key = jax.random.PRNGKey(0)
kc_, kq_ = jax.random.split(key, 2)
centers = jax.random.normal(kc_, (N_CENTERS, D), jnp.float32)
centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)


@jax.jit
def gen_chunk(centers, i):
    k = jax.random.fold_in(jax.random.PRNGKey(1), i)
    ka, kn = jax.random.split(k)
    a = jax.random.randint(ka, (C,), 0, N_CENTERS)
    e = centers[a] + (0.35 / jnp.sqrt(D)) * jax.random.normal(kn, (C, D), jnp.float32)
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


def sync(x):
    return np.asarray(jnp.sum(x))


def timeit(name, fn, reps=8, windows=3):
    out = fn()
    sync(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {best * 1000:.2f} ms/call", flush=True)
    return best


q = None
for i in range(1):
    e = gen_chunk(centers, jnp.int32(0))
    kr, kn2 = jax.random.split(kq_)
    r = jax.random.randint(kr, (NQ,), 0, C)
    q = e[r] + (0.25 / jnp.sqrt(D)) * jax.random.normal(kn2, (NQ, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    del e

t0 = time.perf_counter()
ivf = build_ivf_streaming(
    functools.partial(gen_chunk, centers), N // C,
    iters=8, sample_rows=C, max_list_size=2048, quantize=True,
)
sync(ivf.emb_perm)
print(f"build: {time.perf_counter() - t0:.1f}s K={ivf.k_clusters} "
      f"max_list={ivf.max_list}", flush=True)

N_DOCS, Q_BATCH, T, V_BITS, W_P = 6, 4, 64, 18, 512
V = 1 << V_BITS
rng = np.random.default_rng(3)
counts = rng.integers(1, W_P + 1, size=V).astype(np.int64)
indptr = np.zeros(V + 1, np.int64)
np.cumsum(counts, out=indptr[1:])
nnz = int(indptr[-1])
nnz_pad = -(-(nnz + dma_slack(W_P)) // 1024) * 1024
kc2, kt2, kqt2 = jax.random.split(jax.random.PRNGKey(3), 3)
sparse = SparseIndex(
    indptr=jnp.asarray(indptr, jnp.int32),
    chunk_ids=jax.random.randint(kc2, (nnz_pad,), 0, N, jnp.int32),
    tf=jax.random.randint(kt2, (nnz_pad,), 1, 5, jnp.int32).astype(jnp.float32),
    df=jnp.asarray(counts, jnp.float32),
    chunk_len=jnp.full((N,), 300.0, jnp.float32), avgdl=jnp.float32(300.0),
    dl=jnp.full((nnz_pad,), 300.0, jnp.float32),
    vocab_bits=V_BITS, max_postings=W_P, dma_pad=nnz_pad - nnz)
rows = jnp.arange(N, dtype=jnp.int32)
per_doc = N // N_DOCS
doc_id = jnp.minimum(rows // per_doc, N_DOCS - 1).astype(jnp.int32)
idx_flat = CorpusIndex(
    emb=jnp.zeros((N, 1), jnp.int8), doc_id=doc_id, page=rows % 500 + 1,
    year=2020 + doc_id, company_id=jnp.zeros((N,), jnp.int32),
    kind=jnp.zeros((N,), jnp.int32), page_seg=rows // 4,
    chunk_in_doc=rows % per_doc, valid=jnp.ones((N,), bool),
    sparse=sparse, n_chunks=N, n_pages=N // 4, n_docs=N_DOCS, dim=D)
idx_co, _, ivf_co = cluster_order_index(idx_flat, None, ivf)
del idx_flat
doc_masks = jnp.stack([idx_co.doc_id == d for d in range(N_DOCS)])
doc_valid = jnp.asarray([True, True, True, False, False, False])
row_slot = jnp.where(idx_co.doc_id < 3, idx_co.doc_id, N_DOCS).astype(jnp.int32)
slot_doc = jnp.asarray([0, 1, 2, -1, -1, -1], jnp.int32)
q_valid = jnp.ones((Q_BATCH,), bool)
q_terms = jax.random.randint(kqt2, (Q_BATCH, T), 0, V, jnp.int32)
qb = q[:Q_BATCH]
nprobe = 8

import threading

for QB in (4, 8, 16, 32):
    cfg_h = SearchConfig(method="basic", top_k=30, max_queries=QB,
                         max_docs=N_DOCS, top_n=30, use_bm25=True,
                         bm25_top_k=30, use_ivf=True, ivf_nprobe=nprobe)
    qv = jnp.ones((QB,), bool)
    qt = jax.random.randint(kqt2, (QB, T), 0, V, jnp.int32)
    qq = q[:QB]
    call = lambda x=qq, c=cfg_h, v=qv, t=qt: search_device(
        idx_co, x, v, doc_masks, doc_valid, c, t, ivf_co, row_slot,
        slot_doc=slot_doc)[0].score
    t1 = timeit(f"full hybrid QB={QB}", call)
    print(f"  -> {QB / t1:.0f} qps single-dispatch", flush=True)

    def two_thread():
        box = {}
        def half(i):
            o = None
            for _ in range(4):
                o = call()
            box[i] = o
        th = threading.Thread(target=half, args=(1,))
        th.start(); half(0); th.join()
        sync(box[0]); sync(box[1])
        return box[0]
    t2 = timeit(f"  2-thread x8 calls QB={QB}", two_thread, reps=1)
    print(f"  -> {8 * QB / t2:.0f} qps serving", flush=True)

cfg_h = SearchConfig(method="basic", top_k=30, max_queries=Q_BATCH,
                     max_docs=N_DOCS, top_n=30, use_bm25=True,
                     bm25_top_k=30, use_ivf=True, ivf_nprobe=nprobe)
cfg_d = SearchConfig(method="basic", top_k=30, max_queries=Q_BATCH,
                     max_docs=N_DOCS, top_n=30, use_bm25=False,
                     use_ivf=True, ivf_nprobe=nprobe)

t_h = timeit("full hybrid (dense probes + bm25 + fusion)",
             lambda: search_device(idx_co, qb, q_valid, doc_masks, doc_valid,
                                   cfg_h, q_terms, ivf_co, row_slot,
                                   slot_doc=slot_doc)[0].score)
t_d = timeit("dense probes + fusion only",
             lambda: search_device(idx_co, qb, q_valid, doc_masks, doc_valid,
                                   cfg_d, None, ivf_co, row_slot,
                                   slot_doc=slot_doc)[0].score)

# engine pair shape: (Q_BATCH queries x 3 routed slots) pairs
pair_doc = jnp.repeat(slot_doc[None, :3], Q_BATCH, 0).reshape(-1)
q_pairs = jnp.repeat(qb, 3, axis=0)
t_ivf = timeit(f"ivf_search alone ({Q_BATCH * 3} pairs, nprobe={nprobe})",
               lambda: ivf_search(ivf_co, q_pairs, 30, nprobe=nprobe,
                                  pair_doc=pair_doc,
                                  pos_doc=idx_co.doc_id)[0])

# raw span kernel at the same volume: pairs x nprobe spans
G = Q_BATCH * 3 * nprobe
starts = (jax.random.randint(jax.random.PRNGKey(7), (G,), 0,
                             ivf_co.emb_perm.shape[0] // 32 - ivf.max_list // 32,
                             jnp.int32)) * 32
from rag_challenge_2_tpu.ops.quant import quantize_rows
q8, _ = quantize_rows(jnp.repeat(qb, 3 * nprobe, axis=0))
t_k = timeit(f"raw span kernel ({G} spans, W={ivf.max_list})",
             lambda: probe_span_scores(ivf_co.emb_perm, q8, starts,
                                       window=ivf.max_list))
gb = G * (-(-ivf.max_list // 128) * 128) * D / 1e9
print(f"kernel bandwidth: {gb / t_k:.0f} GB/s of {gb:.2f} GB/call")
print(f"bm25+fusion share = {1000 * (t_h - t_d):.2f} ms; "
      f"probe share inside dense = {1000 * t_ivf:.2f} ms")
