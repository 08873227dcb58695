"""End-to-end quality harness (eval/e2e.py): PDF fixture → full pipeline
→ scored answers.  The closest in-repo analogue of the reference's
127-question judged benchmark (SURVEY §4)."""

import numpy as np
import pytest

from rag_challenge_2_tpu.eval.e2e import (
    ExtractiveStubProvider, GOLDEN_QA, build_fixture, fixture_docs, run_e2e,
    write_pdf)


def test_write_pdf_roundtrips_through_minipdf():
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages

    pages = ["第一页\n营业收入为12.5亿元，同比增长。", "第二页\nRevenue (CNY) 12.5"]
    got = extract_pdf_pages(write_pdf(pages))
    assert len(got) == 2
    assert "营业收入为12.5亿元" in got[0]
    assert "Revenue (CNY) 12.5" in got[1]
    assert got[0].splitlines()[0] == "第一页"


def test_fixture_docs_carry_every_golden_fact():
    """Every golden answer must be literally present on its gold page —
    otherwise a scorer miss would blame retrieval for a fixture bug."""
    docs = {(d["company"], None): d for d in fixture_docs()}
    by_company = {}
    for d in fixture_docs():
        by_company.setdefault(d["company"], []).append(d)
    import re

    for g in GOLDEN_QA:
        ym = re.search(r"(20\d{2})年", g["question"])
        cands = by_company[g["company"]]
        if ym:
            cands = [d for d in cands if d["year"] == int(ym.group(1))]
        assert cands, g["question"]
        for d in cands:
            page = d["pages"][g["gold_page"] - 1]
            page_text = page if isinstance(page, str) else (
                page["text"] + "\n"
                + "\n".join(c for row in page.get("table", []) for c in row)
            )
            if g["schema"] == "number":
                assert str(g["value"]) in page_text, (g["question"], d["sha1"])
            elif g["schema"] == "names":
                for item in g["value"]:
                    assert item in page_text


def test_extractive_stub_is_context_bound():
    """The answerer must return N/A when the context lacks the metric —
    no fixture knowledge baked in."""
    stub = ExtractiveStubProvider()
    system = "本题要求返回一个数值。"
    human = ('上下文:\n"""\nText retrieved from page 3: \n"""\n'
             '与营收无关的治理信息。\n"""\n"""\n\n---\n\n问题:\n'
             '"某公司2023年营业收入是多少亿元？"\n')
    import json

    out = json.loads(stub._complete("m", system, human, 0))
    assert out["final_answer"] == "N/A"


@pytest.mark.slow
def test_run_e2e_full_pipeline(tmp_path):
    """Parse(minipdf) → merge → chunk → encode(random) + BM25 → index →
    routed hybrid query → two-stage answer → competition scorer.  The
    hybrid pipeline must answer the golden set essentially perfectly —
    any parsing/chunking/routing/retrieval regression lands here."""
    res = run_e2e(tmp_path, pretrain_steps=0)
    assert res["n"] == len(GOLDEN_QA)
    assert res["page_hit"] >= 0.9, res["per_question"]
    assert res["value_accuracy"] >= 0.9, [
        q for q in res["per_question"] if q["score"] < 1.0
    ]
