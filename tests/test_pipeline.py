"""Pipeline stages end-to-end on a txt-based fixture with offline config
(the reference's data-driven verification style, SURVEY.md §4)."""

import json

import numpy as np
import pytest

from rag_challenge_2_tpu.pipeline import Pipeline, configs, next_available_filename
from rag_challenge_2_tpu.pipeline.run import RunConfig
from rag_challenge_2_tpu.llm import StubProvider


@pytest.fixture
def data_root(tmp_path, rng):
    root = tmp_path / "test_set"
    (root / "pdf_reports").mkdir(parents=True)
    (root / "pdf_reports" / "J2023_jp.txt").write_text(
        "金盘科技2023年年报\n\n营业收入为50.2亿元，同比增长20%\f第二页：研发费用2.1亿元",
        encoding="utf-8",
    )
    (root / "pdf_reports" / "J2024_jp.txt").write_text(
        "金盘科技2024年年报\n\n营业收入为68.9亿元，同比增长37%\f第二页：研发费用3.2亿元",
        encoding="utf-8",
    )
    (root / "subset.csv").write_text(
        "sha1,company_name,year\nJ2023_jp,金盘科技,2023\nJ2024_jp,金盘科技,2024\n",
        encoding="utf-8",
    )
    (root / "questions.json").write_text(json.dumps([
        {"question": "金盘科技2024年营业收入是多少", "schema": "number"},
    ], ensure_ascii=False), encoding="utf-8")
    return root


def _embedder(rng, dim=32):
    def embed(texts):
        out = np.stack([
            rng.normal(size=dim) + len(t) * 0.01 for t in texts
        ]).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)
    return embed


def _offline_pipeline(root, rng):
    answer = json.dumps({
        "step_by_step_analysis": "步骤" * 40, "reasoning_summary": "s",
        "relevant_pages": [1], "final_answer": 68.9,
    }, ensure_ascii=False)
    provider = StubProvider({
        "候选页面": json.dumps({"selected_pages": [1], "reasoning": "r"}, ensure_ascii=False),
        "上下文": answer,
    })
    cfg = RunConfig(api_provider="stub", answering_model="stub",
                    parallel_requests=1, parent_document_retrieval=True,
                    submission_file=True, config_suffix="_offline")
    return Pipeline(root, cfg, embedder=_embedder(rng), provider=provider)


def test_full_pipeline_stages(data_root, rng):
    p = _offline_pipeline(data_root, rng)
    p.parse_pdf_reports()
    assert (p.paths.parsed_reports_path / "J2024_jp.json").exists()
    p.process_parsed_reports()
    assert p.paths.index_path.exists()
    assert (p.paths.reports_markdown_path / "J2024_jp.md").exists()
    chunked = json.loads((p.paths.documents_dir / "J2024_jp.json").read_text())
    assert chunked["content"]["chunks"], "chunks produced"

    result = p.process_questions()
    assert result["statistics"]["total_questions"] == 1
    answers = data_root / "answers_offline.json"
    assert answers.exists()
    sub = json.loads(answers.read_text())
    assert sub["answers"][0]["value"] == 68.9


def test_numbered_filenames(tmp_path):
    p = tmp_path / "answers.json"
    assert next_available_filename(p) == p
    p.write_text("{}")
    assert next_available_filename(p).name == "answers_01.json"


def test_configs_registry_covers_reference_presets():
    # the reference's 12 named configs (src/pipeline.py:476-488) + offline
    for key in ("base", "pdr", "max", "max_no_ser_tab", "max_nst_o3m",
                "max_st_o3m", "ibm_llama70b", "ibm_llama8b",
                "gemini_thinking", "qwen", "qwen_max", "qwen_plus", "offline"):
        assert key in configs
    assert configs["max_nst_o3m"].llm_reranking
    assert configs["gemini_thinking"].full_context


def test_pipeline_with_ivf(data_root, rng, monkeypatch):
    p = _offline_pipeline(data_root, rng)
    p.run_config.use_ivf = True
    p.parse_pdf_reports()
    p.process_parsed_reports()
    proc = p.build_processor()
    assert proc.engine.ivf is not None
    out = proc.get_answer_for_company("金盘科技", "2024年营业收入", "number")
    assert out["final_answer"] == 68.9

    # the build persisted an IVF sidecar keyed to this corpus artifact; a
    # fresh processor must LOAD it, never re-run k-means (the reference's
    # indexes persist, src/ingestion.py:92-102)
    from pathlib import Path

    from rag_challenge_2_tpu.retrieval.engine import QueryEngine

    assert Path(str(p.paths.index_path) + ".ivf.npz").exists()

    def boom(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("IVF was rebuilt instead of loaded")

    monkeypatch.setattr(QueryEngine, "build_ivf", boom)
    proc2 = p.build_processor()
    assert proc2.engine.ivf is not None
    out2 = proc2.get_answer_for_company("金盘科技", "2024年营业收入", "number")
    assert out2["final_answer"] == 68.9

    # rebuilding the corpus npz invalidates the sidecar (fingerprint)
    from rag_challenge_2_tpu.index.store import index_fingerprint, load_ivf

    fp = index_fingerprint(p.paths.index_path)
    assert load_ivf(Path(str(p.paths.index_path) + ".ivf.npz"), "bogus") is None
    assert load_ivf(Path(str(p.paths.index_path) + ".ivf.npz"), fp) is not None

    # cluster_order: the processor serves from the IVF's list-ordered
    # buffer (one store for probes + flat paths) and still answers
    p.run_config.cluster_order = True
    proc3 = p.build_processor()
    assert proc3.engine.index.emb is proc3.engine.ivf.emb_perm
    # window is recomputed over the PERMUTED layout (0 when docs fragment;
    # a tiny corpus may keep them contiguous — either is valid)
    out3 = proc3.get_answer_for_company("金盘科技", "2024年营业收入", "number")
    assert out3["final_answer"] == 68.9


def test_auto_pretrain_on_first_index_build(data_root, rng, monkeypatch):
    """With no embedder injected and no saved params, the index build
    ICT-pretrains the encoder first instead of silently indexing with
    random embeddings (quality-trap guard)."""
    import rag_challenge_2_tpu.models.pretrain as pretrain_mod
    from rag_challenge_2_tpu.models.encoder import EmbeddingModel, EncoderConfig

    calls = {}

    def fake_pretrain(texts, enc_cfg=None, pre_cfg=None, **kw):
        calls["n_texts"] = len(texts)
        calls["steps"] = pre_cfg.steps
        return EmbeddingModel(EncoderConfig()), {"final": {}}

    monkeypatch.setattr(pretrain_mod, "pretrain_encoder", fake_pretrain)
    monkeypatch.setenv("RAGTPU_AUTO_PRETRAIN_STEPS", "7")
    cfg = RunConfig(api_provider="stub", answering_model="stub", config_suffix="_auto")
    p = Pipeline(data_root, cfg)  # NOTE: no embedder injected
    p.parse_pdf_reports()
    p.merge_reports()
    p.export_reports_to_markdown()
    p.chunk_reports()
    p.create_vector_dbs()
    assert calls["steps"] == 7 and calls["n_texts"] > 0
    assert (p.paths.databases_path / "encoder_params.npz").exists()
    assert p.paths.index_path.exists()

    # opt-out honored
    monkeypatch.setenv("RAGTPU_AUTO_PRETRAIN", "0")
    calls.clear()
    (p.paths.databases_path / "encoder_params.npz").unlink()
    p2 = Pipeline(data_root, RunConfig(api_provider="stub", answering_model="stub",
                                       config_suffix="_auto2"))
    p2.create_vector_dbs()
    assert not calls, "auto-pretrain must respect RAGTPU_AUTO_PRETRAIN=0"


def test_pipeline_quantize_int8_processor(tmp_path, rng):
    """quantize_int8 preset flag: the processor serves from an int8 index."""
    import dataclasses
    import shutil

    import jax.numpy as jnp

    from rag_challenge_2_tpu.pipeline import Pipeline, configs

    root = tmp_path / "set"
    shutil.copytree("data/test_set", root)
    cfg = dataclasses.replace(configs["offline"], quantize_int8=True)
    import os
    os.environ["RAGTPU_AUTO_PRETRAIN"] = "0"
    try:
        pipe = Pipeline(root, cfg)
        pipe.parse_pdf_reports()
        pipe.process_parsed_reports()
        proc = pipe.build_processor()
        assert proc.engine.index.emb.dtype == jnp.int8
        assert proc.engine.index.emb_scale is not None
        ans = proc.get_answer_for_company("金盘科技", "金盘科技2024年营业收入是多少？", "number")
        assert ans["references"], "int8-served answers still carry citations"
    finally:
        os.environ.pop("RAGTPU_AUTO_PRETRAIN", None)


def test_pipeline_threads_scan_rt(data_root, rng):
    """RunConfig.scan_rt reaches the QA layer (and thus SearchConfig —
    tests/test_engine.py covers the engine route); answers on a tiny
    corpus are unchanged (the knob only engages at huge window sizes)."""
    p = _offline_pipeline(data_root, rng)
    p.run_config.scan_rt = 0.99
    p.parse_pdf_reports()
    p.process_parsed_reports()
    proc = p.build_processor()
    assert proc.config.scan_rt == 0.99
    out = proc.get_answer_for_company("金盘科技", "2024年营业收入", "number")
    assert out["final_answer"] == 68.9
