"""LLM layer: jsonfix, providers (stub), facade routing, reranker, expansion,
glossary — all offline per SURVEY.md §4."""

import json

import pytest

from rag_challenge_2_tpu.llm import (
    LLMFacade,
    LLMReranker,
    RateLimiter,
    StubProvider,
    find_financial_concepts,
    loads_lenient,
    schemas,
)
from rag_challenge_2_tpu.retrieval.expansion import expand_query


# ---------------------------------------------------------------- jsonfix

def test_jsonfix_plain():
    assert loads_lenient('{"a": 1}') == {"a": 1}


def test_jsonfix_fenced_and_prose():
    t = 'Sure! Here is the JSON:\n```json\n{"score": 0.5, "ok": true}\n```\nHope it helps'
    assert loads_lenient(t) == {"score": 0.5, "ok": True}


def test_jsonfix_trailing_comma_and_truncation():
    assert loads_lenient('{"a": [1, 2,], }') == {"a": [1, 2]}
    assert loads_lenient('{"a": {"b": 1}') == {"a": {"b": 1}}


def test_jsonfix_garbage():
    assert loads_lenient("no json here") is None
    assert loads_lenient("") is None


# ---------------------------------------------------------------- provider

def test_stub_structured_validation_and_default():
    p = StubProvider({"好问题": {"score": 0.9, "reasoning": "匹配", "is_correct": True}})
    out = p.send_message(
        system_content="judge", human_content="好问题",
        is_structured=True, response_format=schemas.EvaluationSchema,
    )
    assert out == {"score": 0.9, "reasoning": "匹配", "is_correct": True}
    # unmatched → schema-shaped safe default
    out2 = p.send_message(
        system_content="judge", human_content="???",
        is_structured=True, response_format=schemas.EvaluationSchema,
    )
    assert set(out2) == {"score", "reasoning", "is_correct"}
    assert out2["is_correct"] is False


def test_structured_repair_round():
    # scripted reply is broken JSON; repair prompt then returns clean JSON
    p = StubProvider({
        "评估": "{'score': 0.3, 'reasoning': ok...",  # broken
        "修复": json.dumps({"score": 0.3, "reasoning": "r", "is_correct": False}),
    })
    out = p.send_message(
        system_content="评估", human_content="评估这个",
        is_structured=True, response_format=schemas.EvaluationSchema,
    )
    assert out["score"] == 0.3


# ---------------------------------------------------------------- facade

def test_question_type_detection():
    d = LLMFacade.detect_question_type
    assert d("2024年营业收入是多少", "68.9亿元") == "number"
    assert d("公司是否进行了分红", "是") == "boolean"
    assert d("介绍一下公司的主营业务", "变压器") == "open"
    # number keyword but no digits in standard answer → open
    assert d("收入构成如何", "以海外为主") == "open"


def test_rag_answer_schema_routing():
    ans = {"step_by_step_analysis": "x" * 10, "reasoning_summary": "s",
           "relevant_pages": [1, 2], "final_answer": 68.9}
    f = LLMFacade(StubProvider({"营业收入": json.dumps(ans, ensure_ascii=False)}))
    out = f.get_answer_from_rag_context("营业收入是多少", "context...", "number")
    assert out["final_answer"] == 68.9
    with pytest.raises(ValueError, match="Unsupported schema"):
        f.get_answer_from_rag_context("q", "c", "nope")


def test_rephrased_questions_company_mapping():
    subs = {"sub_questions": [
        {"question": "A公司2024年营收是多少？", "reasoning": "r"},
        {"question": "B公司2024年营收是多少？", "reasoning": "r"},
    ]}
    f = LLMFacade(StubProvider({"原始问题": json.dumps(subs, ensure_ascii=False)}))
    out = f.get_rephrased_questions("A公司和B公司谁营收高", companies=["B公司", "A公司", "C公司"])
    assert out["A公司"].startswith("A公司")
    assert out["B公司"].startswith("B公司")
    # unmatched company must NOT inherit another company's sub-question —
    # it falls back to the original (comparative) question
    assert out["C公司"] == "A公司和B公司谁营收高"


def test_evaluate_answer_uses_typed_rubric():
    f = LLMFacade(StubProvider({
        "标准答案": json.dumps({"score": 1.0, "reasoning": "匹配", "is_correct": True}),
    }))
    out = f.evaluate_answer("2024年净利润是多少", "5.1亿元", "净利润5.1亿元")
    assert out["is_correct"] and out["question_type"] == "number"


# ---------------------------------------------------------------- reranker

def test_reranker_batch_and_combined_score():
    ranking = {"block_rankings": [
        {"reasoning": "r1", "relevance_score": 0.9},
        {"reasoning": "r2", "relevance_score": 0.1},
    ]}
    rr = LLMReranker(StubProvider({"文本块集合": json.dumps(ranking, ensure_ascii=False)}))
    rr.rate_limiter = RateLimiter(0)  # no throttling in tests
    docs = [
        {"text": "блок1", "distance": 0.8, "source_sha1": "a"},
        {"text": "блок2", "distance": 0.9, "source_sha1": "b"},
    ]
    out = rr.rerank_documents("q", docs, documents_batch_size=2)
    assert out[0]["combined_score"] == round(0.9 * 0.8, 4)
    assert out[0]["source_sha1"] == "a"  # reranked above the higher-sim doc
    assert rr.get_stats()["successful_requests"] == 1


def test_reranker_mismatch_falls_back_to_single():
    bad_batch = {"block_rankings": [{"reasoning": "r", "relevance_score": 0.5}]}  # 1 for 2 docs
    single = {"reasoning": "s", "relevance_score": 0.7}
    rr = LLMReranker(StubProvider({
        "文本块集合": json.dumps(bad_batch, ensure_ascii=False),
        "文本块:": json.dumps(single, ensure_ascii=False),
    }))
    rr.rate_limiter = RateLimiter(0)
    docs = [{"text": "t1", "distance": 1.0}, {"text": "t2", "distance": 0.5}]
    out = rr.rerank_documents("q", docs, documents_batch_size=2)
    assert all(d["relevance_score"] == 0.7 for d in out)
    assert rr.get_stats()["batch_fallbacks"] == 1


# ---------------------------------------------------------------- expansion

def test_expansion_hyde_and_multiquery_with_dedup():
    p = StubProvider(scripted={})
    # script by system-prompt match: HyDE + synonym produce output, others skip
    p.scripted = {
        "虚构": "| 指标 | 数值 |\n|营业收入|68.9亿元|",
        "同义指标名": "<金盘科技2024年营业收入 名词解释：营收>\n<金盘科技2024年营业收入 名词解释：营收>",
    }
    res = expand_query(
        p, "金盘科技2024年营业收入是多少",
        use_hyde=True, use_multi_query=True,
        multi_query_config={"synonym": True, "subquestion": True, "variant": False},
    )
    assert res.queries[0] == "金盘科技2024年营业收入是多少"
    assert res.hyde_text and "营业收入" in res.hyde_text
    # duplicate synonym query deduped; subquestion returned <SKIP>
    assert len([q for q in res.queries if "名词解释" in q]) == 1
    assert res.multi_query_texts[0]["method_id"] == 1
    assert "营业收入" in (res.glossary_context or "")
    # variant method disabled → only 2 provider calls + hyde
    assert len(p.calls) == 3


def test_expansion_disabled_returns_original_only():
    p = StubProvider()
    res = expand_query(p, "问题", use_hyde=False, use_multi_query=False)
    assert res.queries == ["问题"]
    assert p.calls == []


# ---------------------------------------------------------------- glossary

def test_glossary_match_and_fallback():
    hits = find_financial_concepts("公司的ROE和毛利率怎么样", top_n=3)
    terms = [h["term"] for h in hits]
    assert "净资产收益率" in terms and "毛利率" in terms
    fallback = find_financial_concepts("今天天气", top_n=2)
    assert len(fallback) == 2


def test_safe_default_number_is_na_not_zero():
    from rag_challenge_2_tpu.llm.providers import _safe_default

    d = _safe_default(schemas.NumberAnswer)
    assert d["final_answer"] == "N/A"  # never a confident 0
    assert _safe_default(schemas.BooleanAnswer)["final_answer"] is False


def test_jsonfix_top_level_array():
    arr = loads_lenient('[{"a": 1}, {"a": 2}]')
    assert arr == [{"a": 1}, {"a": 2}]
    # prose before an array
    arr2 = loads_lenient('Here you go:\n[{"relevance_score": 0.5, "reasoning": "r"}]')
    assert isinstance(arr2, list) and arr2[0]["relevance_score"] == 0.5
