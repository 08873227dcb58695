"""MicroBatcher: concurrent requests coalesce into one dispatch with
results identical to unbatched QueryEngine.search (field for field)."""

import threading

import numpy as np
import pytest

from rag_challenge_2_tpu.retrieval.engine import QueryEngine, SearchConfig
from rag_challenge_2_tpu.serving.batcher import MicroBatcher


@pytest.fixture
def engine(tiny_corpus):
    idx, meta, reports, embs = tiny_corpus
    return QueryEngine(idx, meta), embs


def _q_for(embs, doc, row, rng, noise=0.01):
    q = embs[doc][row] + noise * rng.normal(size=embs[doc].shape[1])
    return (q / np.linalg.norm(q)).astype(np.float32)[None, :]


def _same(a, b):
    import jax

    a, b = jax.device_get(a), jax.device_get(b)
    assert np.asarray(a.key).tolist() == np.asarray(b.key).tolist()
    assert np.asarray(a.rep_row).tolist() == np.asarray(b.rep_row).tolist()
    np.testing.assert_allclose(
        np.asarray(a.score), np.asarray(b.score), rtol=1e-5, atol=1e-5
    )


def test_batched_parity_under_threads(engine, rng):
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10, use_bm25=True)
    batcher = MicroBatcher(eng, max_batch=4, window_ms=30.0)
    reqs = [
        (_q_for(embs, d, r, rng), f"doc{d} chunk{r} 营业收入")
        for d, r in [(0, 5), (1, 3), (2, 7), (0, 1)]
    ]
    got = [None] * len(reqs)
    errs = []

    def run(i):
        try:
            q, text = reqs[i]
            got[i] = batcher.search(
                q, "金盘科技", question=text, cfg=cfg
            )
        except BaseException as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for (q, text), res in zip(reqs, got):
        want = eng.search(q, "金盘科技", cfg=cfg, query_texts=[text])
        _same(res, want)
    # all four shared the route → at most 2 dispatches (timing-dependent),
    # and every request went through the batched path
    assert batcher.stats["requests"] == 4
    assert batcher.stats["batched_requests"] == 4
    assert 1 <= batcher.stats["dispatches"] <= 4


def test_empty_texts_bind_own_question(engine, rng):
    """A follower whose query_texts is an EXPLICIT empty list must BM25-
    score its OWN question, not the batch leader's (regression: the
    engine's falsy fallback inside a batch resolves to the leader's
    question — the batcher must bind [] per-request like None)."""
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10, use_bm25=True)
    batcher = MicroBatcher(eng, max_batch=2, window_ms=50.0)
    q_lead = _q_for(embs, 0, 5, rng)
    q_follow = _q_for(embs, 1, 3, rng)
    lead_question = "doc0 chunk5 营业收入"
    follow_question = "doc1 chunk3 毛利率"
    got = {}
    errs = []

    def lead():
        try:
            got["lead"] = batcher.search(
                q_lead, "金盘科技", question=lead_question, cfg=cfg
            )
        except BaseException as e:  # pragma: no cover
            errs.append(e)

    def follow():
        try:
            got["follow"] = batcher.search(
                q_follow, "金盘科技", question=follow_question, cfg=cfg,
                query_texts=[],
            )
        except BaseException as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=lead), threading.Thread(target=follow)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # unbatched search([]) falls back to the request's OWN question
    want = eng.search(q_follow, "金盘科技", question=follow_question,
                      cfg=cfg, query_texts=[])
    _same(got["follow"], want)


def test_single_request_passthrough(engine, rng):
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10)
    batcher = MicroBatcher(eng, max_batch=4, window_ms=1.0)
    q = _q_for(embs, 0, 5, rng)
    res = batcher.search(q, "金盘科技", cfg=cfg)
    _same(res, eng.search(q, "金盘科技", cfg=cfg))
    assert batcher.stats["dispatches"] == 1


def test_overflow_promotes_new_leader(engine, rng):
    """More waiters than max_batch: the overflow is led by a promoted
    waiter — nothing deadlocks, everything returns the right answer."""
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10)
    batcher = MicroBatcher(eng, max_batch=2, window_ms=50.0)
    rows = [5, 3, 7, 1, 9]
    got = [None] * len(rows)

    def run(i):
        got[i] = batcher.search(_q_for(embs, 0, rows[i], rng), "金盘科技", cfg=cfg)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(rows))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(len(rows)):
        assert got[i] is not None, f"request {i} never completed"
    assert batcher.stats["batched_requests"] == 5
    assert batcher.stats["dispatches"] >= 3  # ceil(5 / max_batch=2)


def test_distinct_routes_do_not_batch(engine, rng):
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10)
    batcher = MicroBatcher(eng, max_batch=4, window_ms=5.0)
    q1 = _q_for(embs, 0, 5, rng)
    r1 = batcher.search(q1, "金盘科技", selected_years=[2023], cfg=cfg)
    batcher.search(_q_for(embs, 1, 3, rng), "金盘科技",
                   selected_years=[2024], cfg=cfg)
    _same(r1, eng.search(q1, "金盘科技", selected_years=[2023], cfg=cfg))
    assert batcher.stats["dispatches"] == 2


def test_equivalent_routes_share_a_dispatch(engine, rng):
    """Groups key on the RESOLVED route: [2023] and [2022, 2023] resolve
    to the same document (no 2022 report exists), so they may ride one
    dispatch — the raw-years key kept them apart."""
    eng, embs = engine
    cfg = SearchConfig(method="basic", top_k=5, top_n=10)
    batcher = MicroBatcher(eng, max_batch=4, window_ms=60.0)
    assert (eng.routed_docs("金盘科技", selected_years=[2023])
            == eng.routed_docs("金盘科技", selected_years=[2022, 2023]))
    reqs = [
        (_q_for(embs, 0, 5, rng), [2023]),
        (_q_for(embs, 0, 3, rng), [2022, 2023]),
    ]
    got = [None] * 2

    def run(i):
        q, years = reqs[i]
        got[i] = batcher.search(q, "金盘科技", selected_years=years, cfg=cfg)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for (q, years), res in zip(reqs, got):
        assert res is not None
        _same(res, eng.search(q, "金盘科技", selected_years=years, cfg=cfg))
    # timing-dependent: 1 dispatch when they coalesce, 2 if the leader
    # fired before the second arrived — never more
    assert 1 <= batcher.stats["dispatches"] <= 2


def test_error_propagates_to_all_waiters(engine, rng):
    eng, embs = engine
    batcher = MicroBatcher(eng, max_batch=4, window_ms=5.0)
    with pytest.raises(ValueError, match="No report found"):
        batcher.search(_q_for(embs, 0, 5, rng), "不存在公司")


def test_large_corpus_degrades_to_passthrough(engine, rng, monkeypatch):
    """Above the measured break-even (WIN_MAX_ROWS) the batcher must STOP
    batching — pass-through with unbatched parity — instead of warning
    and halving throughput (measured 0.51x at 1.5M rows)."""
    import rag_challenge_2_tpu.serving.batcher as bmod

    eng, embs = engine
    monkeypatch.setattr(bmod, "WIN_MAX_ROWS", 1)  # tiny corpus counts as huge
    cfg = SearchConfig(top_n=5, top_k=8, use_bm25=True, bm25_top_k=8)
    with pytest.warns(UserWarning, match="pass-through"):
        mb = MicroBatcher(eng, max_batch=8, window_ms=50.0)
    assert mb.passthrough

    q = _q_for(embs, 0, 3, rng)
    direct = eng.search(q, "金盘科技", "营业收入", cfg=cfg,
                        query_texts=["营业收入"])
    results = [None] * 4

    def call(i):
        results[i] = mb.search(q, "金盘科技", "营业收入", cfg=cfg,
                               query_texts=["营业收入"])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for r in results:
        _same(r, direct)
    # no coalescing happened: every request was its own dispatch
    assert mb.stats["dispatches"] == mb.stats["requests"] == 4
    assert mb.stats["batched_requests"] == 0


def test_force_batching_overrides_passthrough(engine, rng, monkeypatch):
    import rag_challenge_2_tpu.serving.batcher as bmod

    eng, embs = engine
    monkeypatch.setattr(bmod, "WIN_MAX_ROWS", 1)
    with pytest.warns(UserWarning, match="FORCED"):
        mb = MicroBatcher(eng, max_batch=8, window_ms=50.0,
                          force_batching=True)
    assert not mb.passthrough
    cfg = SearchConfig(top_n=5, top_k=8, use_bm25=True, bm25_top_k=8)
    q = _q_for(embs, 0, 3, rng)
    direct = eng.search(q, "金盘科技", "营业收入", cfg=cfg,
                        query_texts=["营业收入"])
    barrier = threading.Barrier(3)
    results = [None] * 3

    def call(i):
        barrier.wait()
        results[i] = mb.search(q, "金盘科技", "营业收入", cfg=cfg,
                               query_texts=["营业收入"])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for r in results:
        _same(r, direct)
    assert mb.stats["batched_requests"] == 3
    assert mb.stats["dispatches"] < 3
