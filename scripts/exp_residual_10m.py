"""Experiment: centroid-residual int8 vs plain int8 at 10M×1024 (VERDICT r4 #3).

Mirrors bench.py::bench_int8_10m's generator exactly (same keys) so recall
is comparable to the recorded 0.9197 plain-int8 ceiling.  Codebook is
LEARNED (sampled k-means on chunk 0) — never the generator's true centers.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from rag_challenge_2_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import functools

import jax
import jax.numpy as jnp

from rag_challenge_2_tpu.ops.kmeans import assign_clusters, kmeans
from rag_challenge_2_tpu.ops.quant import (
    int8_residual_approx_topk, int8_residual_topk, quantize_rows,
    quantize_rows_residual)

NEG_INF_F = -3.0e38
N, D, C, NQ, N_CENTERS = 10_000_000, 1024, 500_000, 127, 4096
K_CODE = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def log(*a):
    print(*a, flush=True)


def sync(x):
    np.asarray(jnp.sum(x))


key = jax.random.PRNGKey(0)
kc_, kq_ = jax.random.split(key, 2)
centers = jax.random.normal(kc_, (N_CENTERS, D), jnp.float32)
centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)


@jax.jit
def gen_f32(centers, i):
    k = jax.random.fold_in(jax.random.PRNGKey(1), i)
    ka, kn = jax.random.split(k)
    a = jax.random.randint(ka, (C,), 0, N_CENTERS)
    e = centers[a] + (0.35 / jnp.sqrt(D)) * jax.random.normal(kn, (C, D), jnp.float32)
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def gen_write(buf, scales, assigns, code, centers, i):
    # gen + assign + residual-quantize + write in ONE jit: the f32 chunk
    # and its temporaries stay XLA-managed (the 10.2 GB buf leaves no
    # room for host-visible f32 copies)
    k = jax.random.fold_in(jax.random.PRNGKey(1), i)
    ka, kn = jax.random.split(k)
    a_ = jax.random.randint(ka, (C,), 0, N_CENTERS)
    e = centers[a_] + (0.35 / jnp.sqrt(D)) * jax.random.normal(kn, (C, D), jnp.float32)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    q8, sc, a = quantize_rows_residual(e, code)
    buf = jax.lax.dynamic_update_slice(buf, q8, (i * C, jnp.int32(0)))
    scales = jax.lax.dynamic_update_slice(scales, sc, (i * C,))
    assigns = jax.lax.dynamic_update_slice(assigns, a, (i * C,))
    return buf, scales, assigns, e


@jax.jit
def oracle_merge(top_v, top_i, q, chunk_f32, base):
    s = jnp.dot(q, chunk_f32.T, preferred_element_type=jnp.float32)
    v, j = jax.lax.top_k(s, 10)
    cv = jnp.concatenate([top_v, v], axis=1)
    ci = jnp.concatenate([top_i, j + base], axis=1)
    nv, nj = jax.lax.top_k(cv, 10)
    return nv, jnp.take_along_axis(ci, nj, axis=1)


t0 = time.perf_counter()
e0 = gen_f32(centers, jnp.int32(0))
sync(e0)
log(f"chunk0 gen: {time.perf_counter() - t0:.1f}s")

# learned codebook: k-means on a 250k sample of chunk 0
t0 = time.perf_counter()
code, _ = kmeans(e0[:250_000], K_CODE, iters=6, seed=0)
sync(code)
log(f"kmeans K={K_CODE} on 250k sample: {time.perf_counter() - t0:.1f}s")

# queries drawn from chunk 0 (same draw as bench_int8_10m)
kr, kn2 = jax.random.split(kq_)
r = jax.random.randint(kr, (NQ,), 0, C)
q = e0[r] + (0.25 / jnp.sqrt(D)) * jax.random.normal(kn2, (NQ, D), jnp.float32)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
sync(q)
del e0

buf = jnp.zeros((N, D), jnp.int8)
scales = jnp.zeros((N,), jnp.float32)
assigns = jnp.zeros((N,), jnp.int32)
top_v = jnp.full((NQ, 10), NEG_INF_F, jnp.float32)
top_i = jnp.full((NQ, 10), -1, jnp.int32)
t0 = time.perf_counter()
for i in range(N // C):
    buf, scales, assigns, e = gen_write(buf, scales, assigns, code, centers,
                                        jnp.int32(i))
    top_v, top_i = oracle_merge(top_v, top_i, q, e, jnp.int32(i * C))
    del e
sync(buf)
sync(top_v)
log(f"residual store build (gen+assign+quant+oracle): {time.perf_counter() - t0:.1f}s")
oracle = np.asarray(top_i)
log("mean residual scale:", float(jnp.mean(scales)))


def best_qps(fn, n_queries, reps, windows=3):
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out[0])
        best = max(best, n_queries * reps / (time.perf_counter() - t0))
    return best


def measure(fn, label):
    v, i = fn()
    sync(v)
    got = np.asarray(i)
    r10 = float(np.mean([
        len(set(got[j]) & set(oracle[j])) / 10 for j in range(NQ)]))
    qps = best_qps(fn, NQ, 3)
    log(f"{label}: {qps:.1f} qps, recall@10 = {r10:.4f}")
    return r10, qps


log(f"--- codebook K={K_CODE} (plain int8 r04: exact 1636.8 qps/0.9197, "
    "approx 5627.6/0.9150) ---")
measure(lambda: int8_residual_topk(q, buf, scales, assigns, code, 10,
                                   query_2pass=False),
        "RESIDUAL exact 1-pass")
measure(lambda: int8_residual_topk(q, buf, scales, assigns, code, 10,
                                   query_2pass=True),
        "RESIDUAL exact 2-pass")
measure(lambda: int8_residual_approx_topk(q, buf, scales, assigns, code, 10,
                                          recall_target=0.95),
        "RESIDUAL approx 2-pass rt=0.95")

from rag_challenge_2_tpu.ops.topk import blocked_topk

measure(lambda: int8_residual_approx_topk(q, buf, scales, assigns, code, 10,
                                          recall_target=0.95,
                                          query_2pass=False),
        "RESIDUAL approx 1-pass rt=0.95")
measure(lambda: blocked_topk(q, buf, 10, row_scale=scales, assign=assigns,
                             centroids=code, query_2pass=True,
                             approx_rt=0.95, block=2 << 20),
        "RESIDUAL approx 2-pass rt=0.95 block=2M")
measure(lambda: blocked_topk(q, buf, 10, row_scale=scales, assign=assigns,
                             centroids=code, query_2pass=True,
                             approx_rt=0.85, block=2 << 20),
        "RESIDUAL approx 2-pass rt=0.85 block=2M")
# block=5M removed: the [2B, 5M] i32 accumulator OOMs (measured twice)

from rag_challenge_2_tpu.ops.quant import int8_residual_topk_rescored

for kc in (32, 48, 96):
    measure(lambda kc=kc: int8_residual_topk_rescored(
                q, buf, scales, assigns, code, 10, k_cand=kc,
                recall_target=0.95),
            f"RESIDUAL rescored k_cand={kc}")
