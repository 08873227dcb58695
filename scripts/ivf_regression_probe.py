"""Bisect the r02→r03 IVF-1M recall/build regression (VERDICT r3 item 5).

Reproduces bench.bench_ivf_1m's exact corpus/queries (same PRNGKeys) and
measures recall@10 at nprobe ∈ {4, 8} through BOTH probe implementations:

* ``impl="xla"``   — the scan path (the only path in round 2),
* ``impl="auto"``  — the Pallas span kernel bench.py exercised in round 3,

plus the build-time split (k-means vs balance vs scatter) to attribute
the 59 s → 138.8 s build slowdown.

Usage: python scripts/ivf_regression_probe.py [N]   (default 1_000_000)
Writes /tmp/ivf_probe.json.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rag_challenge_2_tpu.index.ivf import build_ivf, ivf_search
from rag_challenge_2_tpu.ops.kmeans import kmeans
from rag_challenge_2_tpu.ops.topk import dense_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K_CLUSTERS, NQ, N_CENTERS = 1024, 4096, 127, 1024

key = jax.random.PRNGKey(0)
kc_, ka_, kn_, kr_, kqn_ = jax.random.split(key, 5)


@functools.partial(jax.jit, static_argnames=("n",))
def gen_corpus(n):
    centers = jax.random.normal(kc_, (N_CENTERS, D), jnp.float32)
    centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
    a = jax.random.randint(ka_, (n,), 0, N_CENTERS)
    e = centers[a] + (0.35 / jnp.sqrt(D)) * jax.random.normal(kn_, (n, D), jnp.float32)
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


@jax.jit
def gen_queries(emb):
    r = jax.random.randint(kr_, (NQ,), 0, emb.shape[0])
    qq = emb[r] + (0.25 / jnp.sqrt(D)) * jax.random.normal(kqn_, (NQ, D), jnp.float32)
    return qq / jnp.linalg.norm(qq, axis=1, keepdims=True)


emb = gen_corpus(N)
q = gen_queries(emb)
emb.block_until_ready()
out = {"N": N}

# ---- build-time split -----------------------------------------------------
t0 = time.perf_counter()
cent, assign = kmeans(emb, K_CLUSTERS, iters=8, seed=0)
np.asarray(assign)
out["kmeans_s"] = round(time.perf_counter() - t0, 1)

t0 = time.perf_counter()
ivf = build_ivf(emb, n_clusters=K_CLUSTERS, iters=8,
                max_list_size=max(2 * N // K_CLUSTERS, 16))
ivf.emb_perm.block_until_ready()
out["build_total_s"] = round(time.perf_counter() - t0, 1)
out["k_clusters"] = ivf.k_clusters
out["max_list"] = ivf.max_list
print("build split:", out, flush=True)

oracle_v, oracle_i = dense_topk(q, emb, 10, impl="xla")
oracle10 = np.asarray(oracle_i)

for impl in ("xla", "auto"):
    for nprobe in (4, 8):
        _, rows = ivf_search(ivf, q, 10, nprobe=nprobe, impl=impl)
        got = np.asarray(rows)
        r10 = float(np.mean([
            len(set(got[i]) & set(oracle10[i])) / 10 for i in range(NQ)
        ]))
        out[f"recall10_np{nprobe}_{impl}"] = round(r10, 4)
        print(f"impl={impl} nprobe={nprobe}: recall@10={r10:.4f}", flush=True)

json.dump(out, open("/tmp/ivf_probe.json", "w"), indent=1)
print(json.dumps(out))
