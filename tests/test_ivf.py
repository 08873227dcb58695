"""k-means + IVF index: clustering sanity, recall vs exact, routing mask."""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_challenge_2_tpu.index.ivf import build_ivf, ivf_search
from rag_challenge_2_tpu.ops.kmeans import assign_clusters, kmeans
from rag_challenge_2_tpu.ops.topk import dense_topk


def _clustered_data(rng, n_clusters=8, per=100, d=32, spread=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = np.repeat(centers, per, axis=0) + spread * rng.normal(
        size=(n_clusters * per, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), centers


def test_kmeans_recovers_clusters(rng):
    x, centers = _clustered_data(rng)
    cents, assign = kmeans(jnp.asarray(x), 8, iters=15, seed=1)
    assign = np.asarray(assign)
    # points from the same true cluster should mostly share a label
    purity = 0
    for c in range(8):
        labels = assign[c * 100 : (c + 1) * 100]
        purity += np.bincount(labels, minlength=8).max()
    assert purity / len(x) > 0.9


def test_kmeans_batched_recovers_clusters_per_group(rng):
    """One batched dispatch over G independent problems (the IVF
    balancing path, index/ivf._balance_clusters) must cluster each group
    as well as per-group Lloyd's would."""
    from rag_challenge_2_tpu.ops.kmeans import kmeans_batched

    groups = []
    for g in range(3):
        x, _ = _clustered_data(rng, n_clusters=4, per=50, d=16)
        groups.append(x)
    xs = jnp.asarray(np.stack(groups))           # [3, 200, 16]
    cents, assign = kmeans_batched(xs, 4, iters=15, seed=2)
    assert cents.shape == (3, 4, 16) and assign.shape == (3, 200)
    assign = np.asarray(assign)
    for g in range(3):
        purity = 0
        for c in range(4):
            labels = assign[g, c * 50 : (c + 1) * 50]
            purity += np.bincount(labels, minlength=4).max()
        # random-init Lloyd's occasionally merges two tight clusters (an
        # empty-cluster local minimum) — 0.85 still separates signal from
        # noise; the argmin check below is the exact parity assertion
        assert purity / 200 > 0.85
        # assignments must be argmin-distance vs the returned centroids
        d = np.linalg.norm(
            groups[g][:, None, :] - np.asarray(cents[g])[None], axis=2
        )
        np.testing.assert_array_equal(assign[g], d.argmin(axis=1))


def test_kmeans_batched_clamps_k_to_n(rng):
    from rag_challenge_2_tpu.ops.kmeans import kmeans_batched

    xs = jnp.asarray(rng.normal(size=(2, 3, 8)).astype(np.float32))
    cents, assign = kmeans_batched(xs, 16, iters=4, seed=0)
    assert cents.shape[1] == 3                   # k clamped to n
    assert set(np.asarray(assign).ravel()) <= {0, 1, 2}


def test_assign_blocks_match_full(rng):
    x = rng.normal(size=(1000, 16)).astype(np.float32)
    c = rng.normal(size=(10, 16)).astype(np.float32)
    a1 = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(c), block=128))
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(a1, d.argmin(1))


def test_ivf_recall_vs_exact(rng):
    x, _ = _clustered_data(rng, n_clusters=16, per=200, d=64)
    q = x[rng.choice(len(x), 20)] + 0.01 * rng.normal(size=(20, 64)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    idx = build_ivf(jnp.asarray(x), n_clusters=16, iters=10)
    xv, xi = dense_topk(jnp.asarray(q), jnp.asarray(x), 10, impl="xla")
    # generous probes → near-exact
    vv, vi = ivf_search(idx, jnp.asarray(q), 10, nprobe=8)
    recall = np.mean([
        len(set(np.asarray(vi[b])) & set(np.asarray(xi[b]))) / 10 for b in range(20)
    ])
    assert recall > 0.95, recall
    # tight probes → still decent on clustered data
    vv1, vi1 = ivf_search(idx, jnp.asarray(q), 10, nprobe=2)
    recall1 = np.mean([
        len(set(np.asarray(vi1[b])) & set(np.asarray(xi[b]))) / 10 for b in range(20)
    ])
    assert recall1 > 0.5, recall1


def test_ivf_scores_match_exact_for_found_rows(rng):
    x, _ = _clustered_data(rng, n_clusters=4, per=50, d=16)
    q = x[:3]
    idx = build_ivf(jnp.asarray(x), n_clusters=4, iters=8)
    vals, rows = ivf_search(idx, jnp.asarray(q), 5, nprobe=4)
    for b in range(3):
        for j in range(5):
            r = int(rows[b, j])
            if r >= 0:
                np.testing.assert_allclose(
                    float(vals[b, j]), float(q[b] @ x[r]), rtol=1e-4, atol=1e-5
                )


def test_ivf_respects_mask_and_padding(rng):
    x, _ = _clustered_data(rng, n_clusters=4, per=64, d=16)
    n = len(x)
    xp = np.zeros((n + 64, 16), np.float32)
    xp[:n] = x
    valid = np.zeros((n + 64,), bool)
    valid[:n] = True
    idx = build_ivf(jnp.asarray(xp), n_clusters=4, iters=5, valid=jnp.asarray(valid))
    mask = np.zeros((n + 64,), bool)
    mask[: n // 2] = True
    vals, rows = ivf_search(idx, jnp.asarray(x[:2]), 8, nprobe=4, mask=jnp.asarray(mask))
    rows = np.asarray(rows)
    assert (rows[rows >= 0] < n // 2).all()


def test_balanced_build_caps_lists():
    # local rng: data must not depend on suite execution order
    rng = np.random.default_rng(7)
    # heavily skewed data: half the points near one center
    d = 32
    c0 = rng.normal(size=d).astype(np.float32); c0 /= np.linalg.norm(c0)
    others = rng.normal(size=(7, d)).astype(np.float32)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    pts = [c0 + 0.02 * rng.normal(size=(400, d)).astype(np.float32)]
    for c in others:
        pts.append(c + 0.02 * rng.normal(size=(40, d)).astype(np.float32))
    x = np.concatenate(pts).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    plain = build_ivf(jnp.asarray(x), n_clusters=8, iters=8)
    capped = build_ivf(jnp.asarray(x), n_clusters=8, iters=8, max_list_size=80)
    assert plain.max_list > 80, "skew sanity"
    # soft cap: dense blobs may overshoot modestly, never by the original skew
    assert capped.max_list <= int(80 * 1.6)
    assert capped.max_list < plain.max_list * 0.6
    assert capped.k_clusters > plain.k_clusters

    # recall preserved with a modest probe bump
    q = jnp.asarray(x[rng.choice(len(x), 10)])
    from rag_challenge_2_tpu.ops.topk import dense_topk
    _, oracle = dense_topk(q, jnp.asarray(x), 10, impl="xla")
    # balancing grows K; probe proportionally (same corpus fraction scanned)
    _, got = ivf_search(capped, q, 10, nprobe=max(8, capped.k_clusters // 2))
    rec = np.mean([
        len(set(np.asarray(got[b])) & set(np.asarray(oracle[b]))) / 10
        for b in range(10)
    ])
    assert rec > 0.9, rec


def test_masked_probe_selection_finds_minority_cluster():
    """Routing must steer the coarse probes: a query pointing away from the
    routed company's region must still reach that company's clusters."""
    rng = np.random.default_rng(3)
    d = 64
    a = rng.normal(size=d).astype(np.float32); a /= np.linalg.norm(a)
    b = -a  # opposite region
    xa = a + 0.02 * rng.normal(size=(900, d)).astype(np.float32)
    xb = b + 0.02 * rng.normal(size=(100, d)).astype(np.float32)
    x = np.concatenate([xa, xb]).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = build_ivf(jnp.asarray(x), n_clusters=32, iters=8)
    mask = np.zeros(1000, bool)
    mask[900:] = True  # route to company B only
    # query resembles region A — with mask-blind probing all probes land in A
    q = jnp.asarray(x[:1])
    vals, rows = ivf_search(idx, q, 5, nprobe=4, mask=jnp.asarray(mask))
    rows = np.asarray(rows)
    assert (rows[0] >= 900).all(), rows[0]
    # batched [B, N] masks: two queries routed to different companies
    masks = np.zeros((2, 1000), bool)
    masks[0, 900:] = True
    masks[1, :900] = True
    q2 = jnp.asarray(x[:2])
    _, rows2 = ivf_search(idx, q2, 5, nprobe=4, mask=jnp.asarray(masks))
    rows2 = np.asarray(rows2)
    assert (rows2[0] >= 900).all()
    assert ((rows2[1] >= 0) & (rows2[1] < 900)).all()


def test_ivf_save_load_roundtrip(tmp_path, rng):
    """Persisted IVF sidecar restores every field (f32 and int8 probes)
    and search results are identical to the in-memory index."""
    from rag_challenge_2_tpu.index.ivf import quantize_ivf
    from rag_challenge_2_tpu.index.store import load_ivf, save_ivf

    x = rng.normal(size=(300, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = jnp.asarray(x[:5] + 0.01)
    for variant in ("f32", "int8"):
        idx = build_ivf(jnp.asarray(x), n_clusters=8, iters=6)
        if variant == "int8":
            idx = quantize_ivf(idx)
        p = tmp_path / f"ivf_{variant}.npz"
        save_ivf(p, idx, fingerprint="abc")
        back = load_ivf(p, expect_fingerprint="abc")
        assert back is not None
        assert back.k_clusters == idx.k_clusters
        assert back.max_list == idx.max_list
        assert back.emb_perm.dtype == idx.emb_perm.dtype
        v0, r0 = ivf_search(idx, q, 7, nprobe=3)
        v1, r1 = ivf_search(back, q, 7, nprobe=3)
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
        # wrong fingerprint / missing file → None (caller rebuilds)
        assert load_ivf(p, expect_fingerprint="other") is None
    assert load_ivf(tmp_path / "missing.npz") is None


@pytest.mark.parametrize("quantize", [False, True])
def test_streaming_build_matches_in_memory_quality(rng, quantize):
    """build_ivf_streaming (train-on-sample, assign, donated scatter) must
    produce a structurally valid index whose recall matches the in-memory
    build — the path for stores whose flat+permuted copies exceed HBM
    (10M int8 = 20.5 GB > one v5e chip)."""
    from rag_challenge_2_tpu.index.ivf import build_ivf_streaming, quantize_ivf
    from rag_challenge_2_tpu.ops.kmeans import assign_clusters

    x, _ = _clustered_data(rng, n_clusters=8, per=150, d=32)
    N = x.shape[0]
    C = 300
    chunks = [jnp.asarray(x[i : i + C]) for i in range(0, N, C)]

    ivf = build_ivf_streaming(
        lambda i: chunks[i], len(chunks), n_clusters=8, iters=8,
        sample_rows=600, max_list_size=400, quantize=quantize,
    )
    # structure: live row_ids are a permutation of all corpus rows; pad
    # positions (the Pallas probe kernel's aligned-list layout) carry -1
    row_ids = np.asarray(ivf.row_ids)
    live = row_ids >= 0
    assert sorted(row_ids[live].tolist()) == list(range(N))
    assert ivf.emb_perm.shape[1] == 32
    assert ivf.emb_perm.shape[0] % 128 == 0
    assert ivf.list_align >= 32 and ivf.dma_pad_rows > 0
    assert (ivf.emb_perm.dtype == jnp.int8) == quantize
    assert (ivf.row_scale is not None) == quantize
    offs = np.asarray(ivf.list_offsets)
    assert (offs % ivf.list_align == 0).all() and (np.diff(offs) >= 0).all()
    assert ivf.emb_perm.shape[0] - offs[-1] == ivf.dma_pad_rows
    # every stored row sits in the list its vector assigns to
    a_all = np.asarray(assign_clusters(jnp.asarray(x), ivf.centroids))
    pc = np.asarray(ivf.pos_cluster)
    np.testing.assert_array_equal(pc[live], a_all[row_ids[live]])
    assert (pc[~live] == ivf.k_clusters).all()
    # stored vectors match their source rows
    if not quantize:
        np.testing.assert_allclose(
            np.asarray(ivf.emb_perm)[live], x[row_ids[live]], rtol=1e-6
        )
    else:
        deq = np.asarray(ivf.emb_perm).astype(np.float32) * np.asarray(
            ivf.row_scale
        )[:, None]
        np.testing.assert_allclose(deq[live], x[row_ids[live]], atol=2e-2)

    # recall parity with the in-memory build at the same operating point
    q = jnp.asarray(x[:16] + 0.01)
    oracle = np.asarray(dense_topk(q, jnp.asarray(x), 10)[1])
    mem = build_ivf(jnp.asarray(x), n_clusters=8, iters=8, max_list_size=400)
    if quantize:
        mem = quantize_ivf(mem)
    r_mem = np.asarray(ivf_search(mem, q, 10, nprobe=3)[1])
    r_str = np.asarray(ivf_search(ivf, q, 10, nprobe=3)[1])
    rec = lambda got: np.mean(
        [len(set(got[i]) & set(oracle[i])) / 10 for i in range(16)]
    )
    assert rec(r_str) >= rec(r_mem) - 0.05
    assert rec(r_str) >= 0.8


# ---------------------------------------------------------------- fast path

def test_probe_span_scores_matches_gather(rng):
    """The fused Pallas span kernel (interpret off-TPU) == XLA gather dot."""
    from rag_challenge_2_tpu.ops.pallas_ivf import ROW_ALIGN, probe_span_scores

    N, D, W, G = 4096, 64, 256, 9      # G not a multiple of spans/program
    emb = rng.integers(-127, 128, size=(N, D)).astype(np.int8)
    q = rng.integers(-127, 128, size=(G, D)).astype(np.int8)
    starts = (rng.integers(0, (N - W) // ROW_ALIGN, size=(G,)) * ROW_ALIGN).astype(
        np.int32
    )
    got = np.asarray(probe_span_scores(
        jnp.asarray(emb), jnp.asarray(q), jnp.asarray(starts), window=W,
        interpret=True,
    ))
    pos = starts[:, None] + np.arange(W)
    oracle = np.einsum(
        "gd,gwd->gw", q.astype(np.int32), emb[pos].astype(np.int32)
    ).astype(np.float32)
    np.testing.assert_array_equal(got, oracle)

    # f32 store path
    embf = rng.normal(size=(N, D)).astype(np.float32)
    qf = rng.normal(size=(G, D)).astype(np.float32)
    gotf = np.asarray(probe_span_scores(
        jnp.asarray(embf), jnp.asarray(qf), jnp.asarray(starts), window=W,
        interpret=True,
    ))
    oraclef = np.einsum("gd,gwd->gw", qf, embf[pos])
    np.testing.assert_allclose(gotf, oraclef, rtol=1e-5, atol=1e-4)


def test_ivf_search_routing_modes_agree(rng):
    """mask / win-range / kernel impl all return the same rows+scores on a
    contiguous-doc corpus."""
    x, _ = _clustered_data(rng, n_clusters=8, per=128, d=128)
    N = len(x)                          # 1024, two 512-row "documents"
    idx = build_ivf(jnp.asarray(x), n_clusters=8, iters=8, max_list_size=256)
    assert idx.list_align >= 32 and idx.list_row_min is not None
    q = x[rng.choice(N, 6)] + 0.01 * rng.normal(size=(6, 128)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    # route queries 0-2 to doc A (rows < 512), 3-5 to doc B
    ws = np.array([0, 0, 0, 512, 512, 512], np.int32)
    wl = np.full((6,), 512, np.int32)
    mask = np.zeros((6, N), bool)
    for b in range(6):
        mask[b, ws[b] : ws[b] + wl[b]] = True

    vm, rm = ivf_search(idx, q, 5, nprobe=8, mask=jnp.asarray(mask))
    vw, rw = ivf_search(idx, q, 5, nprobe=8,
                        win_start=jnp.asarray(ws), win_len=jnp.asarray(wl))
    vk, rk = ivf_search(idx, q, 5, nprobe=8,
                        win_start=jnp.asarray(ws), win_len=jnp.asarray(wl),
                        impl="pallas")
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vw), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(rw))
    np.testing.assert_allclose(np.asarray(vw), np.asarray(vk), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rw), np.asarray(rk))
    # every returned row honors its query's range
    rows = np.asarray(rw)
    for b in range(6):
        got = rows[b][rows[b] >= 0]
        assert ((got >= ws[b]) & (got < ws[b] + wl[b])).all()


def test_ivf_search_pair_doc_mode(rng):
    """Cluster-ordered corpora: doc-equality routing == boolean-mask routing."""
    from rag_challenge_2_tpu.index.ivf import cluster_order_index
    from rag_challenge_2_tpu.index.schema import CorpusIndex

    x, _ = _clustered_data(rng, n_clusters=8, per=128, d=128)
    N = len(x)
    rows = np.arange(N, dtype=np.int32)
    doc_id = (rows // 512).astype(np.int32)
    idx0 = CorpusIndex(
        emb=jnp.asarray(x), doc_id=jnp.asarray(doc_id),
        page=jnp.asarray(rows % 7 + 1), year=jnp.asarray(2020 + doc_id),
        company_id=jnp.zeros((N,), jnp.int32), kind=jnp.zeros((N,), jnp.int32),
        page_seg=jnp.asarray(rows // 3), chunk_in_doc=jnp.asarray(rows % 512),
        valid=jnp.ones((N,), bool), sparse=None,
        n_chunks=N, n_pages=N // 3, n_docs=2, dim=128,
    )
    ivf = build_ivf(jnp.asarray(x), n_clusters=8, iters=8, max_list_size=256)
    idx_co, _, ivf_co = cluster_order_index(idx0, None, ivf)
    assert ivf_co.cluster_doc is not None
    P = ivf_co.emb_perm.shape[0]

    q = x[rng.choice(N, 6)] + 0.01 * rng.normal(size=(6, 128)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    pair_doc = np.array([0, 0, 0, 1, 1, -1], np.int32)

    # oracle mask over PERMUTED positions (row ids are the identity now)
    doc_perm = np.asarray(idx_co.doc_id)
    mask = np.zeros((6, P), bool)
    for b in range(6):
        if pair_doc[b] >= 0:
            mask[b] = doc_perm == pair_doc[b]
    vm, rm = ivf_search(ivf_co, q, 5, nprobe=8, mask=jnp.asarray(mask))
    vd, rd = ivf_search(ivf_co, q, 5, nprobe=8,
                        pair_doc=jnp.asarray(pair_doc), pos_doc=idx_co.doc_id)
    vk, rk = ivf_search(ivf_co, q, 5, nprobe=8,
                        pair_doc=jnp.asarray(pair_doc), pos_doc=idx_co.doc_id,
                        impl="pallas")
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vd), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(rd))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vk), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(rk))
    # invalid pair returns nothing
    assert (np.asarray(rd)[5] == -1).all()


def test_cluster_order_index_out_of_range_doc_id(rng):
    """A corpus whose doc_id column carries ids >= n_docs (pad sentinels /
    malformed metadata) must cluster-order without a host IndexError; the
    out-of-range rows are never probe-eligible in doc mode."""
    from rag_challenge_2_tpu.index.ivf import cluster_order_index
    from rag_challenge_2_tpu.index.schema import CorpusIndex

    x, _ = _clustered_data(rng, n_clusters=4, per=64, d=128)
    N = len(x)
    rows = np.arange(N, dtype=np.int32)
    doc_id = (rows // 100).astype(np.int32)   # 100∤256: last rows get id 2
    n_docs = 2
    assert doc_id.max() >= n_docs             # the out-of-range case
    idx0 = CorpusIndex(
        emb=jnp.asarray(x), doc_id=jnp.asarray(doc_id),
        page=jnp.asarray(rows % 7 + 1), year=jnp.asarray(2020 + doc_id),
        company_id=jnp.zeros((N,), jnp.int32), kind=jnp.zeros((N,), jnp.int32),
        page_seg=jnp.asarray(rows // 3), chunk_in_doc=jnp.asarray(rows % 100),
        valid=jnp.ones((N,), bool), sparse=None,
        n_chunks=N, n_pages=N // 3, n_docs=n_docs, dim=128,
    )
    ivf = build_ivf(jnp.asarray(x), n_clusters=4, iters=4, max_list_size=128)
    idx_co, _, ivf_co = cluster_order_index(idx0, None, ivf)   # must not raise
    assert ivf_co.cluster_doc.shape[1] == n_docs

    q = jnp.asarray(x[:2] / np.linalg.norm(x[:2], axis=1, keepdims=True))
    pair_doc = jnp.asarray([0, 1], np.int32)
    vd, rd = ivf_search(ivf_co, q, 5, nprobe=4,
                        pair_doc=pair_doc, pos_doc=idx_co.doc_id)
    rd = np.asarray(rd)
    doc_perm = np.asarray(idx_co.doc_id)
    for b in range(2):
        got = rd[b][rd[b] >= 0]
        assert (doc_perm[got] == int(pair_doc[b])).all()


def test_ivf_search_guards(rng):
    """Unroutable / unsafe ivf_search requests raise instead of silently
    skipping eligibility or forcing the kernel onto an unaligned layout."""
    import dataclasses

    import pytest

    x, _ = _clustered_data(rng, n_clusters=4, per=64, d=128)
    ivf = build_ivf(jnp.asarray(x), n_clusters=4, iters=4, max_list_size=128)
    q = jnp.asarray(x[:2])
    ws = jnp.asarray([0, 0], jnp.int32)
    wl = jnp.asarray([64, 64], jnp.int32)

    # legacy sidecar shape: no per-list row bounds -> win routing refused
    legacy = dataclasses.replace(ivf, list_row_min=None, list_row_max=None)
    with pytest.raises(ValueError, match="list_row_min"):
        ivf_search(legacy, q, 5, nprobe=4, win_start=ws, win_len=wl)

    # forced kernel without the layout contract -> refused
    bare = dataclasses.replace(ivf, list_align=0, dma_pad_rows=0)
    with pytest.raises(ValueError, match="layout contract"):
        ivf_search(bare, q, 5, nprobe=4, impl="pallas")

    # forced kernel with mask routing (no kernel arm for it) -> refused
    mask = jnp.ones((ivf.emb_perm.shape[0],), bool)
    with pytest.raises(ValueError, match="mask routing"):
        ivf_search(ivf, q, 5, nprobe=4, mask=mask, impl="pallas")


def test_fast_path_rejects_unaligned_dim():
    """Mosaic memref slices must be 128-lane-aligned along D: a D=64
    index must NOT auto-route to the span kernel (regression — witnessed
    as a remote-compile HTTP 500 'Slice shape along dimension 1 must be
    aligned to tiling (128)' on the real chip)."""
    from rag_challenge_2_tpu.ops.pallas_ivf import probe_fast_path_ok

    rng = np.random.default_rng(0)
    for dim, want in ((64, False), (128, True)):
        x = rng.normal(size=(256, dim)).astype(np.float32)
        ivf = build_ivf(jnp.asarray(x), n_clusters=8, iters=4)
        assert probe_fast_path_ok(ivf, ivf.max_list) is want
        # and the search still answers through the XLA fallback
        v, r = ivf_search(ivf, jnp.asarray(x[:2]), 5, nprobe=8)
        assert int(np.asarray(r)[0, 0]) == 0


def test_faiss_parity_harness_helpers():
    """scripts/faiss_parity.py must stay runnable where faiss IS
    installed (BASELINE config 3's literal "match faiss at the same
    (K, nprobe)" bar).  faiss is absent in this image, so exercise the
    harness's corpus/oracle helpers and the TPU half of the comparison
    offline; the faiss half importorskips below."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import faiss_parity as fp

    x = fp.make_corpus(2048, 32, seed=0)
    assert np.allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-3)
    rng = np.random.default_rng(1)
    q = x[rng.integers(0, len(x), size=16)]
    oracle = fp.exact_topk(x, q, 5)
    # each query is a corpus row: exact top-1 must be itself (ties aside)
    sims = q @ x.T
    best = sims[np.arange(16), oracle[:, 0]]
    assert np.all(best >= sims.max(axis=1) - 1e-6)
    assert fp.recall(oracle, oracle) == 1.0

    ivf = build_ivf(jnp.asarray(x), n_clusters=32, iters=6, seed=0)
    _, ids = ivf_search(ivf, jnp.asarray(q), 5, nprobe=32)
    # nprobe=K probes every list: exact by construction
    assert fp.recall(np.asarray(ids), oracle) == 1.0


def test_faiss_parity_vs_faiss():
    """The actual curve-vs-curve comparison; runs only where faiss
    exists (skipped in the build image, active for downstream users)."""
    faiss = pytest.importorskip("faiss")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import faiss_parity as fp

    n, d, K, k = 20_000, 64, 64, 10
    x = fp.make_corpus(n, d, seed=0)
    rng = np.random.default_rng(1)
    q = x[rng.integers(0, n, size=64)]
    oracle = fp.exact_topk(x, q, k)

    quant = faiss.IndexFlatIP(d)
    fidx = faiss.IndexIVFFlat(quant, d, K, faiss.METRIC_INNER_PRODUCT)
    fidx.train(x)
    fidx.add(x)
    fidx.nprobe = 8
    _, fids = fidx.search(q, k)

    ivf = build_ivf(jnp.asarray(x), n_clusters=K, iters=10, seed=0)
    _, tids = ivf_search(ivf, jnp.asarray(q), k, nprobe=8)

    r_faiss = fp.recall(fids, oracle)
    r_tpu = fp.recall(np.asarray(tids), oracle)
    # parity bar: within 3 points of faiss's own curve at the same
    # (K, nprobe) — k-means seeds differ, exact equality is not defined
    assert r_tpu >= r_faiss - 0.03, (r_tpu, r_faiss)


def test_pallas_probe_bf16_store_matches_xla():
    """bf16 stores must run the span kernel with the DEFAULT MXU contract:
    requesting fp32 contract precision on bf16 operands is ill-typed for
    Mosaic ("Bad lhs type", witnessed on the real chip r5 — the HIGHEST
    gate keys on the STORE dtype now, ops/pallas_ivf._make_kernel).  The
    kernel's candidate set must match the XLA probe path at equal store
    dtype."""
    import dataclasses

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(16, 128)).astype(np.float32)
    a = rng.integers(0, 16, 4096)
    x = centers[a] + 0.3 * rng.normal(size=(4096, 128)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ivf = build_ivf(jnp.asarray(x), n_clusters=32, iters=5)
    ivf16 = dataclasses.replace(
        ivf, emb_perm=ivf.emb_perm.astype(jnp.bfloat16))
    q = jnp.asarray(x[:8])
    _, rp = ivf_search(ivf16, q, 10, nprobe=4, impl="pallas")
    _, rx = ivf_search(ivf16, q, 10, nprobe=4, impl="xla")
    gp, gx = np.asarray(rp), np.asarray(rx)
    overlap = np.mean([len(set(gp[i]) & set(gx[i])) / 10 for i in range(8)])
    assert overlap >= 0.9, overlap
