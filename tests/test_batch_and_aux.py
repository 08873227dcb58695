"""Async batch engine (vs a local HTTP server), ValOnline, similarity
analysis."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest
from pydantic import BaseModel

from rag_challenge_2_tpu.llm.batch import (
    StatusTracker,
    process_structured_requests,
)


class _Echo(BaseModel):
    answer: str


class _Handler(BaseHTTPRequestHandler):
    fail_first_for: set = set()

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        user = body["messages"][1]["content"]
        if user in _Handler.fail_first_for:
            _Handler.fail_first_for.discard(user)
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b'{"error": "boom"}')
            return
        resp = {
            "choices": [{"message": {"content": json.dumps({"answer": f"re:{user}"})}}]
        }
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture
def llm_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/v1"
    server.shutdown()


def test_batch_structured_requests(llm_server):
    status = StatusTracker()
    out = process_structured_requests(
        [{"system": "s", "user": f"q{i}"} for i in range(5)],
        _Echo, model="m", base_url=llm_server, api_key="k",
        status=status,
    )
    assert [o["answer"] for o in out] == [f"re:q{i}" for i in range(5)]
    assert status.num_tasks_succeeded == 5


def test_batch_retry_on_500(llm_server):
    _Handler.fail_first_for = {"q1"}
    out = process_structured_requests(
        [{"system": "s", "user": "q0"}, {"system": "s", "user": "q1"}],
        _Echo, model="m", base_url=llm_server, api_key="k",
    )
    assert out[1]["answer"] == "re:q1"  # retried and succeeded in order


def test_batch_jsonl_stream(llm_server, tmp_path):
    import asyncio
    from rag_challenge_2_tpu.llm.batch import process_api_requests

    path = tmp_path / "out.jsonl"
    reqs = [{"model": "m", "messages": [
        {"role": "system", "content": "s"}, {"role": "user", "content": f"q{i}"}
    ]} for i in range(3)]
    asyncio.run(process_api_requests(reqs, llm_server, "k", results_path=path))
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 3
    assert all("response" in json.loads(l) for l in lines)


# ------------------------------------------------------------- val_online

def test_val_online_auto_prefix_and_history(tiny_corpus, rng, tmp_path):
    from tests.test_qa import make_processor, BASE_SCRIPT
    from rag_challenge_2_tpu.qa.val_online import ValOnline

    proc, provider = make_processor(tiny_corpus, rng, dict(BASE_SCRIPT))
    vo = ValOnline(proc, default_company="金盘科技",
                   history_path=tmp_path / "hist.json", schema="number")
    ans = vo.ask("2023年营业收入是多少")  # no company in question → prefixed
    assert ans["final_answer"] == 68.9
    hist = json.loads((tmp_path / "hist.json").read_text())
    assert len(hist) == 1 and hist[0]["answer"] == "68.9"
    # second ask threads history
    vo.ask("那净利润呢")
    assert any("历史对话上下文" in c["user"] for c in provider.calls)


def test_val_online_batch(tiny_corpus, rng, tmp_path):
    from tests.test_qa import make_processor, BASE_SCRIPT
    from rag_challenge_2_tpu.qa.val_online import ValOnline

    proc, _ = make_processor(tiny_corpus, rng, dict(BASE_SCRIPT))
    vo = ValOnline(proc, schema="number")
    res = vo.run_batch(
        [{"question": "金盘科技营收", "standard_answer": "68.9"},
         {"question": "", }],
        output_path=tmp_path / "batch.json",
    )
    assert res["total"] == 2 and res["errors"] >= 1
    assert (tmp_path / "batch.json").exists()


# ------------------------------------------------------------- similarity

def test_similarity_matrix_and_stats(tiny_corpus, tmp_path):
    from rag_challenge_2_tpu.eval.similarity import analyze_document, similarity_matrix

    idx, meta, *_ = tiny_corpus
    M = similarity_matrix(idx, 0)
    n0 = meta.docs[0].n_chunks
    assert M.shape == (n0, n0)
    np.testing.assert_allclose(np.diag(M), 1.0, atol=1e-4)  # unit-norm rows
    stats = analyze_document(idx, meta, 0, output_dir=tmp_path)
    assert stats["n_chunks"] == n0
    assert (tmp_path / f"similarity_{meta.docs[0].sha1}.npz").exists()
    with pytest.raises(ValueError):
        similarity_matrix(idx, 99)


def test_similarity_heatmap_written_without_plotly(tiny_corpus, tmp_path):
    """The visual artifact must exist even with no plotting library
    (reference ships Plotly heatmaps; ours falls back to standalone HTML)."""
    from rag_challenge_2_tpu.eval.similarity import analyze_document

    idx, meta, *_ = tiny_corpus
    stats = analyze_document(idx, meta, 0, output_dir=tmp_path)
    html = tmp_path / f"similarity_{meta.docs[0].sha1}.html"
    assert stats["heatmap"] == str(html)
    body = html.read_text(encoding="utf-8")
    assert "<canvas" in body or "plotly" in body.lower()
    assert meta.docs[0].sha1 in body or "Heatmap" in body


def test_canvas_heatmap_downsamples_large_matrices(tmp_path):
    from rag_challenge_2_tpu.eval.similarity import _write_canvas_heatmap

    rng = np.random.default_rng(0)
    M = rng.uniform(-1, 1, size=(700, 700)).astype(np.float32)
    out = tmp_path / "hm.html"
    _write_canvas_heatmap(M, out, "t", max_cells=256)
    body = out.read_text(encoding="utf-8")
    assert "N=256" in body.replace(" ", "")
    assert len(body) < 400_000  # 8-bit + base64, not raw floats


def test_batch_survives_streaming_write_failure(llm_server):
    """A jsonl streaming-write failure must not re-queue a finalized
    request (which would double-decrement the worker exit counter and
    silently drop the rest of the queue) — results stay complete."""
    import asyncio
    from pathlib import Path

    from rag_challenge_2_tpu.llm.batch import process_api_requests

    dev_full = Path("/dev/full")
    if not dev_full.exists():
        pytest.skip("/dev/full not available")
    reqs = [{
        "model": "m", "messages": [{"role": "system", "content": "s"},
                                   {"role": "user", "content": f"q{i}"}],
    } for i in range(6)]
    out = asyncio.run(process_api_requests(
        reqs, llm_server, "k", results_path=dev_full, max_attempts=2,
    ))
    assert len(out) == 6
    assert all("response" in r for r in out), out
