"""Year extraction + routing-mask parity with reference semantics
(reference src/retrieval.py:24-165)."""

import numpy as np

from rag_challenge_2_tpu.retrieval.routing import extract_years_from_question, route_mask


def test_extract_single_year_expanded():
    assert extract_years_from_question("2024年营业收入是多少") == [2023, 2024, 2025]


def test_extract_range_expands_span():
    assert extract_years_from_question("2024年相比2023年增长", True) == [2022, 2023, 2024, 2025]


def test_extract_no_expand():
    assert extract_years_from_question("2024年xxx", expand_window=False) == [2024]


def test_extract_none():
    assert extract_years_from_question("营业收入是多少") == []


def test_extract_requires_nian_suffix():
    # bare "2024" without 年 is not a year mention (reference regex r'(20\d{2})年')
    assert extract_years_from_question("编号2024的文件") == []


def test_route_company_and_year(tiny_corpus):
    idx, meta, reports, _ = tiny_corpus
    cid = meta.company_id("金盘科技")
    m = np.asarray(route_mask(idx, cid, years=[2023]))
    doc = np.asarray(idx.doc_id)
    comp = np.asarray(idx.company_id)
    yr = np.asarray(idx.year)
    valid = np.asarray(idx.valid)
    assert m[valid & (comp == cid) & (yr == 2023)].all()
    assert not m[valid & (comp != cid)].any()
    assert not m[valid & (comp == cid) & (yr != 2023)].any()


def test_route_year_miss_falls_back_to_company(tiny_corpus):
    idx, meta, *_ = tiny_corpus
    cid = meta.company_id("金盘科技")
    m = np.asarray(route_mask(idx, cid, years=[1999]))
    all_company = np.asarray(route_mask(idx, cid))
    np.testing.assert_array_equal(m, all_company)


def test_route_latest_fallback(tiny_corpus):
    idx, meta, *_ = tiny_corpus
    cid = meta.company_id("金盘科技")
    m = np.asarray(route_mask(idx, cid, fallback="latest"))
    yr = np.asarray(idx.year)
    assert (yr[m] == 2024).all()


def test_route_excludes_padding(tiny_corpus):
    idx, meta, *_ = tiny_corpus
    m = np.asarray(route_mask(idx, meta.company_id("宁德时代")))
    assert not m[np.asarray(~idx.valid)].any()


def test_route_unknown_company_is_empty(tiny_corpus):
    # reference raises for unknown companies (src/retrieval.py:843-845);
    # the mask model returns an empty mask, and the retriever layer raises.
    idx, meta, *_ = tiny_corpus
    m = np.asarray(route_mask(idx, meta.company_id("不存在公司")))
    assert not m.any()
