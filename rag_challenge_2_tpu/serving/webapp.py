"""Web QA frontend.

Role of the reference's Streamlit app (reference app_jinpan_qa.py, 3058
LoC): a browser UI over the QA stack with a configuration panel (retrieval
method, max_hops/neighbor_k, HyDE/multi-query toggles, rerank sample size,
year filter, multi-turn window — reference :1528-1857), rich result display
(answer, reasoning, references, all retrieved chunks with scores and
hit-count/method tags, expansion details, timing — reference :466-1477),
and a question-bank + LLM-judge evaluation flow (:2846+).

Streamlit is not available in this image, so the app is a dependency-free
``http.server`` JSON API + a single-page HTML client.  All retrieval runs
on the TPU through the same QuestionsProcessor as the CLI.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from ..eval.judge import JudgeHarness
from ..qa.processor import QuestionsProcessor

_PAGE = """<!DOCTYPE html>
<html lang="zh">
<head>
<meta charset="utf-8"><title>金盘科技年报问答 (TPU)</title>
<style>
 body { font-family: system-ui, "PingFang SC", sans-serif; margin: 0; display: flex; }
 #side { width: 320px; padding: 16px; background: #f5f6f8; height: 100vh;
         overflow-y: auto; box-sizing: border-box; }
 #main { flex: 1; padding: 24px; max-width: 900px; }
 label { display:block; margin: 10px 0 2px; font-size: 13px; color: #444; }
 select, input[type=number], input[type=text] { width: 100%; padding: 4px; }
 .row { display:flex; gap:8px; } .row > div { flex:1; }
 #q { width: 100%; padding: 10px; font-size: 16px; }
 button { margin-top: 10px; padding: 8px 18px; font-size: 15px; cursor: pointer; }
 .tabs { display:flex; gap:4px; margin-top: 18px; flex-wrap: wrap; }
 .tabs button { margin:0; padding: 6px 10px; font-size: 13px; }
 .tabs button.on { background:#2458d6; color:white; }
 .panel { border:1px solid #ddd; padding:14px; margin-top:-1px; white-space:pre-wrap;
          font-size:14px; max-height: 60vh; overflow-y:auto; }
 .answer { font-size: 20px; margin: 16px 0; padding: 14px; background:#eef4ff;
           border-radius: 8px; }
 table { border-collapse: collapse; font-size: 13px; width:100%; }
 td, th { border:1px solid #ccc; padding:4px 6px; text-align:left; }
 .hist { color:#666; font-size:13px; margin:4px 0; }
</style>
</head>
<body>
<div id="side">
 <h3>检索配置</h3>
 <label>检索方法</label>
 <select id="method">
  <option value="basic">Basic</option>
  <option value="ssg">SSG 图遍历</option>
  <option value="triangulation">Triangulation</option>
  <option value="hybrid_expansion">Hybrid Expansion</option>
 </select>
 <div class="row">
  <div><label>max_hops</label><input id="max_hops" type="number" value="4"></div>
  <div><label>neighbor_k</label><input id="neighbor_k" type="number" value="30"></div>
 </div>
 <label><input type="checkbox" id="use_hyde"> HyDE 扩展</label>
 <label><input type="checkbox" id="use_multi_query"> Multi-Query 扩展</label>
 <label><input type="checkbox" id="llm_reranking"> LLM 重排序</label>
 <div class="row">
  <div><label>召回样本</label><input id="sample" type="number" value="30"></div>
  <div><label>top N</label><input id="top_n" type="number" value="10"></div>
 </div>
 <label><input type="checkbox" id="expand_upstream"> 上游页面组扩充</label>
 <label>数据年份 (逗号分隔, 空=全部)</label>
 <input id="years" type="text" placeholder="2023,2024">
 <label>多轮对话窗口</label>
 <input id="history_n" type="number" value="3">
 <h3>问题库</h3>
 <div id="bank"></div>
</div>
<div id="main">
 <h2>金盘科技年报问答 <small style="color:#888">TPU-native</small></h2>
 <div id="history"></div>
 <input id="q" placeholder="例如：2024年营业收入是多少？" />
 <button onclick="ask()">提问</button>
 <div id="answer"></div>
 <div class="tabs" id="tabs"></div>
 <div class="panel" id="panel"></div>
</div>
<script>
let HISTORY = [], LAST = null;
const TABS = [
 ["分析", r => r.step_by_step_analysis || ""],
 ["推理摘要", r => r.reasoning_summary || ""],
 ["引用页", r => JSON.stringify(r.references || [], null, 2)],
 ["召回chunks", r => chunksTable(r.all_retrieved_chunks || [])],
 ["初始召回", r => chunksTable(r.initial_retrieval_results || [])],
 ["查询扩展", r => JSON.stringify(r.expansion_texts || {}, null, 2)],
 ["提示词", r => JSON.stringify(r.prompt_info || {}, null, 2)],
 ["耗时", r => JSON.stringify(r.timing || {}, null, 2)],
];
function chunksTable(cs) {
  if (!cs.length) return "(空)";
  let h = "<table><tr><th>页</th><th>得分</th><th>命中</th><th>方法数</th><th>文本</th></tr>";
  for (const c of cs) {
    const score = (c.distance ?? c.vector_similarity ?? 0);
    h += `<tr><td>${escapeHtml(String(c.page))}</td><td>${score.toFixed ? score.toFixed(3) : escapeHtml(String(score))}</td><td>${c.hit_count ?? ""}</td><td>${c.method_count ?? ""}</td><td>${escapeHtml((c.text || "").slice(0, 160))}</td></tr>`;
  }
  return h + "</table>";
}
function renderTabs() {
  const tabs = document.getElementById("tabs"); tabs.innerHTML = "";
  TABS.forEach(([name, fn], i) => {
    const b = document.createElement("button");
    b.textContent = name;
    b.onclick = () => { document.querySelectorAll('.tabs button').forEach(x => x.classList.remove('on'));
      b.classList.add('on');
      const out = fn(LAST);
      document.getElementById("panel").innerHTML = name.includes("chunks")||name.includes("召回") ? out : escapeHtml(out); };
    tabs.appendChild(b);
  });
}
function escapeHtml(s){const d=document.createElement('div');d.textContent=s;return d.innerHTML;}
async function ask() {
  const q = document.getElementById("q").value.trim();
  if (!q) return;
  document.getElementById("answer").innerHTML = "<div class='answer'>⏳ 检索与生成中…</div>";
  const cfg = {
    question: q,
    method: document.getElementById("method").value,
    max_hops: +document.getElementById("max_hops").value,
    neighbor_k: +document.getElementById("neighbor_k").value,
    use_hyde: document.getElementById("use_hyde").checked,
    use_multi_query: document.getElementById("use_multi_query").checked,
    llm_reranking: document.getElementById("llm_reranking").checked,
    sample_size: +document.getElementById("sample").value,
    top_n: +document.getElementById("top_n").value,
    expand_upstream: document.getElementById("expand_upstream").checked,
    years: document.getElementById("years").value.split(",").map(s=>parseInt(s)).filter(x=>!isNaN(x)),
    history: HISTORY.slice(-(+document.getElementById("history_n").value || 0)),
  };
  const res = await fetch("/api/ask", {method:"POST", headers:{"Content-Type":"application/json"}, body: JSON.stringify(cfg)});
  const data = await res.json();
  if (data.error) { document.getElementById("answer").innerHTML = `<div class='answer'>❌ ${escapeHtml(data.error)}</div>`; return; }
  LAST = data;
  HISTORY.push({question: q, answer: String(data.final_answer)});
  document.getElementById("history").innerHTML = HISTORY.map(h=>`<div class='hist'>Q: ${escapeHtml(h.question)} → ${escapeHtml(h.answer)}</div>`).join("");
  document.getElementById("answer").innerHTML = `<div class='answer'>${escapeHtml(String(data.final_answer))}</div>`;
  renderTabs();
  document.querySelector('.tabs button')?.click();
}
document.getElementById("q").addEventListener("keydown", e => { if (e.key === "Enter") ask(); });
fetch("/api/bank").then(r=>r.json()).then(bank => {
  document.getElementById("bank").innerHTML = bank.map(q=>`<div class='hist' style='cursor:pointer' onclick='document.getElementById("q").value=${JSON.stringify(q)}'>· ${escapeHtml(q)}</div>`).join("");
});
</script>
</body>
</html>"""

DEFAULT_QUESTION_BANK = [
    "2024年营业收入是多少？",
    "2024年相比2023年营业收入增长了多少？",
    "研发费用占营业收入的比例是多少？",
    "公司主要产品有哪些？",
    "海外市场收入占比如何？",
    "2023年净利润是多少？",
    "公司是否进行了现金分红？",
    "资产负债率的变化趋势如何？",
]


class QAWebApp:
    def __init__(
        self,
        processor: QuestionsProcessor,
        default_company: str = "金盘科技",
        question_bank: Optional[List[str]] = None,
    ):
        self.processor = processor
        self.default_company = default_company
        self.question_bank = question_bank or DEFAULT_QUESTION_BANK
        self._lock = threading.Lock()

    def evaluate(self, payload: Dict) -> Dict:
        """LLM-judge a batch of QA records (the reference's 评估结果分析 tab,
        reference app_jinpan_qa.py:2846+): POST records → judged + stats."""
        records = payload.get("records", [])
        if not isinstance(records, list) or not records:
            return {"error": "records must be a non-empty list"}
        harness = JudgeHarness(self.processor.llm)
        return harness.judge_all(records)

    def ask(self, payload: Dict) -> Dict:
        question = payload.get("question", "").strip()
        if not question:
            return {"error": "empty question"}
        companies = self.processor._extract_companies(question)
        q = question if companies else f"{self.default_company}{question}"
        company = companies[0] if companies else self.default_company

        cfg = self.processor.config
        new_cfg = dataclasses.replace(
            cfg,
            retrieval_method=payload.get("method", cfg.retrieval_method),
            max_hops=int(payload.get("max_hops", cfg.max_hops)),
            neighbor_k=int(payload.get("neighbor_k", cfg.neighbor_k)),
            use_hyde=bool(payload.get("use_hyde", cfg.use_hyde)),
            use_multi_query=bool(payload.get("use_multi_query", cfg.use_multi_query)),
            llm_reranking=bool(payload.get("llm_reranking", cfg.llm_reranking))
            and self.processor.reranker is not None,
            llm_reranking_sample_size=int(payload.get("sample_size", cfg.llm_reranking_sample_size)),
            top_n_retrieval=int(payload.get("top_n", cfg.top_n_retrieval)),
            expand_upstream=bool(payload.get("expand_upstream", cfg.expand_upstream)),
        )
        years = payload.get("years") or None
        history = payload.get("history") or None
        with self._lock:  # one question at a time per engine instance
            old = self.processor.config
            self.processor.config = new_cfg
            try:
                answer = self.processor.get_answer_for_company(
                    company, q, new_cfg.schema,
                    conversation_history=history, selected_years=years,
                )
            finally:
                self.processor.config = old
        return answer

    # -------------------------------------------------------------- server
    def make_server(self, host: str = "127.0.0.1", port: int = 8899) -> ThreadingHTTPServer:
        app = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
                elif self.path == "/api/bank":
                    self._send(200, json.dumps(app.question_bank, ensure_ascii=False).encode(),
                               "application/json")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                routes = {"/api/ask": app.ask, "/api/eval": app.evaluate}
                handler = routes.get(self.path)
                if handler is None:
                    self._send(404, b"{}", "application/json")
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    result = handler(payload)
                except Exception as e:
                    result = {"error": f"{type(e).__name__}: {e}"}
                self._send(200, json.dumps(result, ensure_ascii=False, default=str).encode(),
                           "application/json")

            def log_message(self, *a):
                pass

        return ThreadingHTTPServer((host, port), Handler)


def serve(processor: QuestionsProcessor, host: str = "127.0.0.1", port: int = 8899,
          **kwargs) -> None:  # pragma: no cover - blocking entry point
    server = QAWebApp(processor, **kwargs).make_server(host, port)
    print(f"QA web app listening on http://{host}:{port}")
    server.serve_forever()
