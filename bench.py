"""Benchmark: exact retrieval QPS + recall on the val-set-shaped workload.

BASELINE.json metric: "recall@10 vs FAISS-exact + query QPS at equal memory
(val_set, 127 queries)".  The val-set corpus (6 annual-report FAISS DBs,
~10k chunks × 1024-d Qwen embeddings — reference README.md:313-316) is not
shipped in the reference repo, so the bench reproduces its exact shape
synthetically: 6 per-year documents, ~10k unit-norm 1024-d vectors, 127
routed queries.

Baseline = the reference's compute: FAISS IndexFlatIP exact search on CPU
(= BLAS sgemm + partial sort; measured here as the numpy equivalent over
identical data).  Ours = the on-device engine path (routed masked matmul +
fused top-k on TPU).  recall@10 vs the CPU oracle must be 1.0 — exact is
exact — so the headline is QPS at equal recall and equal memory (same f32
matrix, no compression).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr)


def sync(x):
    """Force completion. On the axon TPU relay, ``block_until_ready`` can
    acknowledge before execution finishes; a scalar device→host transfer
    cannot — so all timings here sync by pulling one reduced value."""
    import jax.numpy as jnp
    import numpy as np

    return np.asarray(jnp.sum(x[0] if isinstance(x, tuple) else x))


def main():
    from rag_challenge_2_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from rag_challenge_2_tpu.ops.topk import dense_topk
    from rag_challenge_2_tpu.ops.pallas_topk import pallas_dense_topk

    rng = np.random.default_rng(0)
    N_DOCS, CHUNKS_PER_DOC, D, NQ, K = 6, 1700, 1024, 127, 10
    N = N_DOCS * CHUNKS_PER_DOC
    years = [2020 + i for i in range(N_DOCS)]

    emb = rng.normal(size=(N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    doc_of_row = np.repeat(np.arange(N_DOCS), CHUNKS_PER_DOC)

    # 127 queries; each routed to a year window like the reference's
    # extract_years_from_question (year ±1 → up to 3 docs)
    q = rng.normal(size=(NQ, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_year = rng.integers(0, N_DOCS, size=NQ)
    masks = np.zeros((NQ, N), bool)
    for i in range(NQ):
        sel = np.isin(doc_of_row, [q_year[i] - 1, q_year[i], q_year[i] + 1])
        masks[i] = sel

    # ---- baseline: CPU exact (the reference's FAISS-flat equivalent) ----
    def cpu_exact():
        scores = q @ emb.T
        scores[~masks] = -np.inf
        idx = np.argpartition(-scores, K, axis=1)[:, :K]
        vals = np.take_along_axis(scores, idx, axis=1)
        order = np.argsort(-vals, axis=1)
        return np.take_along_axis(idx, order, axis=1)

    t0 = time.perf_counter()
    oracle_idx = cpu_exact()
    cpu_reps = max(1, int(1.0 / max(time.perf_counter() - t0, 1e-3)))
    t0 = time.perf_counter()
    for _ in range(cpu_reps):
        cpu_exact()
    cpu_qps = NQ * cpu_reps / (time.perf_counter() - t0)
    log(f"baseline cpu exact: {cpu_qps:.1f} qps")

    # ---- ours: on-device masked exact top-k ----
    jq = jnp.asarray(q)
    jemb = jnp.asarray(emb)
    jmask = jnp.asarray(masks)

    def device_exact():
        return dense_topk(jq, jemb, K, mask=jmask, impl="xla")

    vals, idx = device_exact()
    sync(vals)  # compile + settle
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        vals, idx = device_exact()
    sync(vals)
    dev_qps = NQ * reps / (time.perf_counter() - t0)

    got = np.asarray(idx)
    recall = np.mean([
        len(set(got[i]) & set(oracle_idx[i])) / K for i in range(NQ)
    ])
    log(f"device exact: {dev_qps:.1f} qps, recall@{K} vs oracle = {recall:.4f}")

    # secondary metrics
    extras = {}
    try:
        full_mask = jnp.ones((N,), bool)
        pv, _ = pallas_dense_topk(jq, jemb, K, full_mask)
        sync(pv)
        t0 = time.perf_counter()
        for _ in range(reps):
            pv, _ = pallas_dense_topk(jq, jemb, K, full_mask)
        sync(pv)
        extras["pallas_fused_qps"] = round(NQ * reps / (time.perf_counter() - t0), 1)
        log(f"pallas fused (unrouted): {extras['pallas_fused_qps']} qps")
    except Exception as e:  # pragma: no cover
        log(f"pallas path skipped: {e}")

    # bf16 fast mode (one-pass MXU): the serving configuration for corpora
    # where exact f32 parity is not required (recall vs exact ≈ 0.99)
    try:
        emb16 = jemb.astype(jnp.bfloat16)
        q16 = jq.astype(jnp.bfloat16)

        def fast():
            return dense_topk(q16, emb16, K, mask=jmask, impl="xla")

        fv, fi = fast()
        sync(fv)
        t0 = time.perf_counter()
        for _ in range(reps):
            fv, fi = fast()
        sync(fv)
        extras["bf16_fast_qps"] = round(NQ * reps / (time.perf_counter() - t0), 1)
        got16 = np.asarray(fi)
        extras["bf16_recall_at_10"] = round(float(np.mean([
            len(set(got16[i]) & set(oracle_idx[i])) / K for i in range(NQ)
        ])), 4)
        log(f"bf16 fast: {extras['bf16_fast_qps']} qps, recall {extras['bf16_recall_at_10']}")
    except Exception as e:  # pragma: no cover
        log(f"bf16 path skipped: {e}")

    print(json.dumps({
        "metric": "exact_flat_query_qps_valset_shape",
        "value": round(dev_qps, 1),
        "unit": "queries/s (6x1700 docs, 1024d, top-10, year-routed, recall@10=%.3f)" % recall,
        "vs_baseline": round(dev_qps / cpu_qps, 2),
        "baseline_cpu_qps": round(cpu_qps, 1),
        "recall_at_10": round(float(recall), 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
