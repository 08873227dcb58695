"""Ingestion layer: merging rules, splitter, plain-text parser, table
serialization, end-to-end ingest → index."""

import json

import numpy as np
import pytest

from rag_challenge_2_tpu.ingestion import (
    CorpusIngestor,
    PageTextPreparation,
    PlainTextParser,
    TableSerializer,
    TextSplitter,
    clean_text,
    count_tokens,
    normalize_page_sequence,
    split_text,
)
from rag_challenge_2_tpu.llm import StubProvider


# ---------------------------------------------------------------- merging

def _parsed_report(blocks, tables=None, page=1):
    return {
        "metainfo": {"sha1_name": "J2024_t", "company_name": "c", "year": 2024},
        "content": [{"page": page, "content": blocks, "page_dimensions": {}}],
        "tables": tables or [],
        "pictures": [],
    }


def test_merge_drops_footers_and_pictures():
    rep = _parsed_report([
        {"type": "text", "text": "正文"},
        {"type": "page_footer", "text": "第1页"},
        {"type": "picture", "text": ""},
    ])
    out = PageTextPreparation().process_report(rep)
    text = out["content"]["pages"][0]["text"]
    assert "正文" in text and "第1页" not in text


def test_merge_header_levels():
    rep = _parsed_report([
        {"type": "page_header", "text": "年度报告"},
        {"type": "section_header", "text": "财务概要"},
        {"type": "text", "text": "内容"},
    ])
    text = PageTextPreparation().process_report(rep)["content"]["pages"][0]["text"]
    assert "# 年度报告" in text
    assert "## 财务概要" in text  # page_header took the top level


def test_merge_table_group_with_footnote():
    rep = _parsed_report(
        [
            {"type": "text", "text": "主要数据如下："},
            {"type": "table", "table_id": 0, "text": ""},
            {"type": "footnote", "text": "注：单位为万元"},
        ],
        tables=[{"table_id": 0, "page": 1, "markdown": "|指标|数值|\n|--|--|\n|营收|100|"}],
    )
    text = PageTextPreparation().process_report(rep)["content"]["pages"][0]["text"]
    assert "|营收|100|" in text
    assert "注：单位为万元" in text
    assert "### 主要数据如下：" in text


def test_merge_list_group():
    rep = _parsed_report([
        {"type": "text", "text": "主要产品："},
        {"type": "list_item", "text": "干式变压器"},
        {"type": "list_item", "text": "储能系统"},
    ])
    text = PageTextPreparation().process_report(rep)["content"]["pages"][0]["text"]
    assert "- 干式变压器" in text and "- 储能系统" in text


def test_merge_serialized_table_substitution():
    tables = [{
        "table_id": 0, "page": 1, "markdown": "|a|b|",
        "serialized": {"information_blocks": [
            {"subject_core_entity": "营收", "information_block": "2024年营收为100亿元"}
        ]},
    }]
    rep = _parsed_report([{"type": "table", "table_id": 0, "text": ""}], tables)
    p = PageTextPreparation(use_serialized_tables=True, serialized_tables_instead_of_markdown=True)
    text = p.process_report(rep)["content"]["pages"][0]["text"]
    assert "2024年营收为100亿元" in text and "|a|b|" not in text


def test_clean_text_glyphs():
    s, n = clean_text("营收/one.tnum/zero.tnum/percent.tnum glyph<c=3,font=F4>增长")
    assert s == "营收10% 增长".replace(" ", " ") or "10%" in s
    assert n == 4


def test_unknown_block_type_degrades_to_plain_text():
    """docling's label vocabulary is open (title, code, chart, …): unknown
    text-bearing labels must flow through as plain text, not kill the
    merge stage."""
    rep = _parsed_report([{"type": "hologram", "text": "x"},
                          {"type": "title", "text": "年度报告"}])
    out = PageTextPreparation().process_report(rep)
    body = json.dumps(out, ensure_ascii=False)
    assert "x" in body and "年度报告" in body


# ---------------------------------------------------------------- splitter

def test_split_respects_token_budget():
    text = "。".join(f"这是第{i}句话，包含一些财务数据{i*7}万元" for i in range(100))
    chunks = split_text(text, chunk_size=60, chunk_overlap=10)
    assert len(chunks) > 3
    for c in chunks:
        assert count_tokens(c) <= 60 + 12  # small slack for attached separators


def test_split_overlap_carries_context():
    text = "\n\n".join(f"paragraph number {i} with several tokens" for i in range(30))
    chunks = split_text(text, chunk_size=40, chunk_overlap=15)
    # consecutive chunks share some text
    shared = sum(1 for a, b in zip(chunks, chunks[1:]) if a[-12:] in b or b.startswith(a.split()[-1]))
    assert shared >= 1


def test_split_report_appends_serialized_tables():
    report = {
        "metainfo": {"sha1_name": "x"},
        "content": {"pages": [{"page": 1, "text": "正文内容" * 10}]},
    }
    serialized = {"tables": [{
        "table_id": 0, "page": 1,
        "serialized": {"information_blocks": [
            {"subject_core_entity": "营收", "information_block": "营收信息块"}
        ]},
    }]}
    out = TextSplitter().split_report(report, serialized)
    kinds = [c["type"] for c in out["content"]["chunks"]]
    assert "content" in kinds and "serialized_table" in kinds
    ids = [c["id"] for c in out["content"]["chunks"]]
    assert ids == list(range(len(ids)))


def test_split_empty_page():
    report = {"metainfo": {}, "content": {"pages": [{"page": 1, "text": "   "}]}}
    out = TextSplitter().split_report(report)
    assert out["content"]["chunks"] == []


# ------------------------------------------------------------- pdf contract

def test_plain_text_parser(tmp_path):
    doc = tmp_path / "J2024_demo.txt"
    doc.write_text("第一页第一段\n\n第一页第二段\f第二页内容", encoding="utf-8")
    meta = tmp_path / "subset.csv"
    meta.write_text("sha1,company_name,year\nJ2024_demo,金盘科技,2024\n", encoding="utf-8")
    parser = PlainTextParser(tmp_path / "out", metadata_path=meta)
    parser.parse_and_export([doc])
    rep = json.loads((tmp_path / "out" / "J2024_demo.json").read_text())
    assert rep["metainfo"]["company_name"] == "金盘科技"
    assert rep["metainfo"]["year"] == 2024
    assert len(rep["content"]) == 2
    assert rep["content"][0]["content"][0]["text"] == "第一页第一段"


def test_normalize_page_sequence_fills_gaps():
    pages = [{"page": 1, "content": []}, {"page": 4, "content": []}]
    out = normalize_page_sequence(pages)
    assert [p["page"] for p in out] == [1, 2, 3, 4]
    assert out[1]["content"] == []


# --------------------------------------------------------------- serializer

def test_table_serializer(tmp_path):
    blocks = {"subject_core_entities_list": ["营收"],
              "information_blocks": [
                  {"subject_core_entity": "营收", "information_block": "2024年营收100亿"}]}
    provider = StubProvider({"表格": json.dumps(blocks, ensure_ascii=False)})
    rep = _parsed_report(
        [{"type": "text", "text": "上文"}, {"type": "table", "table_id": 0, "text": ""}],
        tables=[{"table_id": 0, "page": 1, "html": "<table>...</table>"}],
    )
    src = tmp_path / "in"; src.mkdir()
    (src / "r.json").write_text(json.dumps(rep, ensure_ascii=False), encoding="utf-8")
    TableSerializer(provider).process_directory_parallel(src, tmp_path / "out")
    out = json.loads((tmp_path / "out" / "r.json").read_text())
    assert out["tables"][0]["serialized"]["information_blocks"][0]["information_block"] == "2024年营收100亿"
    # context made it into the prompt
    assert any("上文" in c["user"] for c in provider.calls)


# ------------------------------------------------------------ end-to-end

def test_ingest_pipeline_to_index(tmp_path, rng):
    # plain text → parse → merge → split → ingest → queryable index
    doc = tmp_path / "J2023_co.txt"
    doc.write_text("金盘科技2023年年报\n\n营业收入为50亿元\f第二页：研发费用2亿元", encoding="utf-8")
    meta = tmp_path / "subset.csv"
    meta.write_text("sha1,company_name,year\nJ2023_co,金盘科技,2023\n", encoding="utf-8")
    parser = PlainTextParser(tmp_path / "parsed", metadata_path=meta)
    parser.parse_and_export([doc])
    merged = PageTextPreparation().process_report(
        json.loads((tmp_path / "parsed" / "J2023_co.json").read_text())
    )
    chunked = TextSplitter().split_report(merged)

    dim = 32
    def embedder(texts):
        out = rng.normal(size=(len(texts), dim)).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)

    ing = CorpusIngestor(embedder, vocab_bits=12)
    idx, cmeta = ing.build([chunked])
    assert idx.n_docs == 1 and idx.n_chunks == len(chunked["content"]["chunks"])
    assert cmeta.companies == ["金盘科技"]
    assert int(np.asarray(idx.year)[0]) == 2023


def test_incremental_add_reports(tmp_path, rng):
    from rag_challenge_2_tpu.ops.topk import dense_topk
    import jax.numpy as jnp

    dim = 16
    calls = {"n": 0}

    def embedder(texts):
        calls["n"] += len(texts)
        out = rng.normal(size=(len(texts), dim)).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)

    def mk(sha1, company, year, texts):
        return {
            "metainfo": {"sha1_name": sha1, "company_name": company, "year": year},
            "content": {
                "pages": [{"page": i + 1, "text": t} for i, t in enumerate(texts)],
                "chunks": [{"page": i + 1, "text": t, "id": i, "type": "content"}
                           for i, t in enumerate(texts)],
            },
        }

    ing = CorpusIngestor(embedder, vocab_bits=12)
    idx1, meta1 = ing.build([mk("J2023_a", "金盘科技", 2023, ["营收50亿", "利润4亿"])])
    n_after_build = calls["n"]
    idx2, meta2 = ing.add_reports(
        idx1, meta1, [mk("J2024_a", "金盘科技", 2024, ["营收68亿", "利润5亿", "研发3亿"])]
    )
    # only the 3 new chunks were embedded
    assert calls["n"] == n_after_build + 3
    assert idx2.n_docs == 2 and idx2.n_chunks == 5
    # old embeddings preserved exactly
    np.testing.assert_allclose(
        np.asarray(idx2.emb[:2]), np.asarray(idx1.emb[:2]), rtol=1e-6
    )
    # both year routes work on the merged index
    from rag_challenge_2_tpu.retrieval.routing import route_mask
    m24 = np.asarray(route_mask(idx2, meta2.company_id("金盘科技"), years=[2024]))
    assert m24.sum() == 3
    # sparse rebuilt over the full corpus
    assert float(idx2.sparse.chunk_len[4]) > 0


def test_assemble_report_docling_fidelity():
    """Captured-shape docling export dict → full-fidelity parsed report
    (reference JsonReportProcessor, src/pdf_parsing.py:364-651) — verified
    without docling installed."""
    from rag_challenge_2_tpu.ingestion.pdf import assemble_report

    bbox = {"l": 10.0, "t": 700.0, "r": 500.0, "b": 650.0}
    data = {
        "origin": {"filename": "J2024_demo.pdf"},
        "pages": {"1": {}, "2": {}},
        "body": {"children": [
            {"$ref": "#/texts/0"},
            {"$ref": "#/groups/0"},
            {"$ref": "#/tables/0"},
            {"$ref": "#/pictures/0"},
            {"$ref": "#/texts/3"},
        ]},
        "groups": [
            {"name": "list", "label": "list", "children": [
                {"$ref": "#/texts/1"}, {"$ref": "#/texts/2"},
            ]},
        ],
        "texts": [
            {"label": "section_header", "text": "第一节 公司简介",
             "orig": "第 一 节 公司简介", "prov": [{"page_no": 1, "bbox": bbox}]},
            {"label": "list_item", "text": "项目一", "orig": "项目一",
             "enumerated": True, "marker": "1.",
             "prov": [{"page_no": 1, "bbox": bbox}]},
            {"label": "list_item", "text": "项目二", "orig": "项目二",
             "enumerated": True, "marker": "2.",
             "prov": [{"page_no": 1, "bbox": bbox}]},
            {"label": "footnote", "text": "注：口径说明", "orig": "注：口径说明",
             "prov": [{"page_no": 2, "bbox": bbox}]},
            {"label": "caption", "text": "图1 营收构成", "orig": "图1 营收构成",
             "prov": [{"page_no": 2, "bbox": bbox}]},
        ],
        "tables": [
            {"self_ref": "#/tables/0", "prov": [{"page_no": 2, "bbox": bbox}],
             "data": {"num_rows": 2, "num_cols": 2, "grid": [
                 [{"text": "指标", "column_header": True,
                   "start_row_offset_idx": 0, "start_col_offset_idx": 0,
                   "row_span": 1, "col_span": 2},
                  {"text": "指标", "column_header": True,
                   "start_row_offset_idx": 0, "start_col_offset_idx": 0,
                   "row_span": 1, "col_span": 2}],
                 [{"text": "营业收入", "start_row_offset_idx": 1,
                   "start_col_offset_idx": 0, "row_span": 1, "col_span": 1},
                  {"text": "68.88亿", "start_row_offset_idx": 1,
                   "start_col_offset_idx": 1, "row_span": 1, "col_span": 1}],
             ]}},
        ],
        "pictures": [
            {"self_ref": "#/pictures/0", "prov": [{"page_no": 2, "bbox": bbox}],
             "children": [{"$ref": "#/texts/4"}]},
        ],
    }
    rep = assemble_report(data, "J2024_demo")

    mi = rep["metainfo"]
    assert mi["sha1_name"] == "J2024_demo"
    assert mi["tables_amount"] == 1 and mi["pictures_amount"] == 1
    assert mi["footnotes_amount"] == 1 and mi["text_blocks_amount"] == 5

    p1, p2 = rep["content"][0], rep["content"][1]
    assert p1["page_dimensions"] == bbox
    # body order preserved: header, then the two grouped list items
    assert [c["type"] for c in p1["content"]] == ["section_header", "list_item", "list_item"]
    assert p1["content"][0]["orig"] == "第 一 节 公司简介"  # orig differs → kept
    assert p1["content"][1]["group_label"] == "list"
    assert p1["content"][1]["marker"] == "1." and p1["content"][1]["enumerated"]
    assert p1["content"][0]["text_id"] == 0
    # page 2: table ref, picture ref, then the footnote
    assert [c["type"] for c in p2["content"]] == ["table", "picture", "footnote"]

    t = rep["tables"][0]
    assert t["#-rows"] == 2 and t["#-cols"] == 2
    assert t["bbox"] == [10.0, 700.0, 500.0, 650.0]
    assert "营业收入" in t["markdown"] and "68.88亿" in t["markdown"]
    assert 'colspan="2"' in t["html"] and "<th" in t["html"]
    assert t["html"].count("<td") == 2  # spanned header emitted once
    assert t["json"]["grid"][1][1]["text"] == "68.88亿"

    pic = rep["pictures"][0]
    assert pic["picture_id"] == 0 and pic["page"] == 2
    assert pic["children"][0]["text"] == "图1 营收构成"
    assert pic["bbox"] == [10.0, 700.0, 500.0, 650.0]


def test_add_reports_dequantizes_int8_store(rng):
    """Incremental build on a quantized index must splice TRUE embeddings,
    not raw int8 codes (codes next to unit-norm floats corrupt scores)."""
    from rag_challenge_2_tpu.index.store import quantize_index

    dim = 16

    def embedder(texts):
        out = rng.normal(size=(len(texts), dim)).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)

    def mk(sha1, year, texts):
        return {
            "metainfo": {"sha1_name": sha1, "company_name": "金盘科技", "year": year},
            "content": {
                "pages": [{"page": i + 1, "text": t} for i, t in enumerate(texts)],
                "chunks": [{"page": i + 1, "text": t, "id": i, "type": "content"}
                           for i, t in enumerate(texts)],
            },
        }

    ing = CorpusIngestor(embedder, vocab_bits=12)
    idx1, meta1 = ing.build([mk("J2023_a", 2023, ["营收50亿", "利润4亿"])])
    f32_rows = np.asarray(idx1.emb[:2])
    q8 = quantize_index(idx1)
    idx2, _ = ing.add_reports(q8, meta1, [mk("J2024_a", 2024, ["营收68亿"])])
    # old rows restored to ~true values (int8 quantization error only)
    assert idx2.emb_scale is None and str(idx2.emb.dtype) == "float32"
    np.testing.assert_allclose(np.asarray(idx2.emb[:2]), f32_rows, atol=2e-2)
    # all rows unit-norm-ish, not code-magnitude (~127)
    norms = np.linalg.norm(np.asarray(idx2.emb[:3]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=5e-2)


def _build_test_pdf() -> bytes:
    """Hand-assemble a 2-page digital-text PDF: page 1 plain ASCII
    (uncompressed stream, Tj + TJ with word-gap kerning + escapes),
    page 2 a Flate-compressed stream using a /Type0 font whose ToUnicode
    CMap (bfchar + incrementing bfrange) decodes 2-byte CIDs to Chinese."""
    import zlib

    c1 = (b"BT /F1 12 Tf 72 720 Td (Annual \\(Report\\) 2024) Tj "
          b"0 -20 Td [(Revenue:) -250 (68.9)] TJ ET")
    cmap = (b"begincmap\n2 beginbfchar\n<0001> <8425>\n<0002> <6536>\n"
            b"endbfchar\n1 beginbfrange\n<0003> <0004> <5165>\nendbfrange\n"
            b"endcmap")
    c2_raw = b"BT /F2 12 Tf 72 720 Td <00010002> Tj T* <0003> Tj ET"
    c2 = zlib.compress(c2_raw)

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 7 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        5: (b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
            b"/Resources << /Font << /F2 8 0 R >> >> >>"),
        6: (b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(c2), c2)),
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        8: b"<< /Type /Font /Subtype /Type0 /BaseFont /X /ToUnicode 9 0 R >>",
        9: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    }
    body = b"%PDF-1.4\n" + b"".join(
        b"%d 0 obj\n%s\nendobj\n" % (n, objs[n]) for n in sorted(objs)
    )
    return body + b"trailer << /Root 1 0 R >>\n%%EOF\n"


def test_minipdf_extracts_ascii_and_cjk(tmp_path):
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages

    pages = extract_pdf_pages(_build_test_pdf())
    assert len(pages) == 2
    assert "Annual (Report) 2024" in pages[0]
    assert "Revenue: 68.9" in pages[0]          # TJ kern -250 -> word gap
    lines = pages[1].split("\n")
    assert lines[0] == "营收"            # 营收 via bfchar
    assert lines[1] == "入"                  # 入 via bfrange (T* newline)


def test_plain_text_parser_handles_pdf(tmp_path):
    """The built-in parser routes .pdf through minipdf into the same
    parsed-report contract as .txt (reference src/pdf_parsing.py output)."""
    from rag_challenge_2_tpu.ingestion.pdf import PlainTextParser

    pdf_path = tmp_path / "J2024_demo.pdf"
    pdf_path.write_bytes(_build_test_pdf())
    out_dir = tmp_path / "parsed"
    parser = PlainTextParser(out_dir)
    parser.parse_and_export([pdf_path])
    report = json.loads((out_dir / "J2024_demo.json").read_text("utf-8"))
    assert report["metainfo"]["sha1_name"] == "J2024_demo"
    assert len(report["content"]) == 2
    texts = [b["text"] for b in report["content"][0]["content"]]
    assert any("Revenue: 68.9" in t for t in texts)
    texts2 = [b["text"] for b in report["content"][1]["content"]]
    assert any("营收" in t for t in texts2)


def _wrap_pdf(objs: dict, trailer: bytes = b"trailer << /Root 1 0 R >>") -> bytes:
    body = b"%PDF-1.4\n" + b"".join(
        b"%d 0 obj\n%s\nendobj\n" % (n, objs[n]) for n in sorted(objs)
    )
    return body + trailer + b"\n%%EOF\n"


def test_minipdf_indirect_contents_array_and_inherited_resources():
    """/Contents may be an indirect ref TO an array of stream refs, and
    /Resources may live on the parent Pages node (PDF-spec inheritance) —
    both silently lost text before."""
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages

    c1 = b"BT /F1 12 Tf 72 720 Td (part one) Tj ET"
    c2 = b"BT /F1 12 Tf 72 700 Td (part two) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # shared Resources on the Pages node; the page has none of its own
        2: (b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F1 7 0 R >> >> >>"),
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"[5 0 R 6 0 R]",
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2),
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    pages = extract_pdf_pages(_wrap_pdf(objs))
    assert len(pages) == 1
    assert "part one" in pages[0] and "part two" in pages[0]


def test_minipdf_malformed_cmap_is_tolerated():
    """Odd-digit bfchar hex and an overflowing bfrange must not abort the
    extraction (damaged-file scope): the page still extracts."""
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages

    cmap = (b"begincmap\n2 beginbfchar\n<0001> <123>\n<0002> <6536>\n"
            b"endbfchar\n1 beginbfrange\n<00F0> <0100> <FFF0>\n"
            b"endbfrange\nendcmap")
    content = b"BT /F2 12 Tf 72 720 Td <0002> Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F2 8 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        8: b"<< /Type /Font /Subtype /Type0 /BaseFont /X /ToUnicode 9 0 R >>",
        9: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    }
    pages = extract_pdf_pages(_wrap_pdf(objs))
    assert pages[0] == "收"             # <0002> still decodes via bfchar


def test_minipdf_inline_image_does_not_swallow_text():
    """BI…ID <binary> EI payloads are raw-skipped: a '(' byte in the pixel
    data must not open a phantom string that eats later Tj operators."""
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages

    content = (b"BT /F1 12 Tf (before) Tj ET\n"
               b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x28\xff\x00\xfe EI\n"
               b"BT /F1 12 Tf (after) Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 7 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    pages = extract_pdf_pages(_wrap_pdf(objs))
    assert "before" in pages[0] and "after" in pages[0]


def test_minipdf_image_streams_not_decoded_and_indirect_filter():
    """Image XObject payloads are never decompressed (memory), and a
    /Filter given as an indirect ref resolves instead of passing
    compressed bytes through as text."""
    import zlib as _z
    from rag_challenge_2_tpu.ingestion.minipdf import _Document

    img = _z.compress(b"\x00" * 64)
    c_raw = b"BT /F1 12 Tf (hello) Tj ET"
    c = _z.compress(c_raw)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 7 0 R >> >> >>"),
        # /Filter via indirect reference (object 10)
        4: (b"<< /Length %d /Filter 10 0 R >>\nstream\n%s\nendstream"
            % (len(c), c)),
        5: (b"<< /Subtype /Image /Width 8 /Height 8 /Filter /FlateDecode "
            b"/Length %d >>\nstream\n%s\nendstream" % (len(img), img)),
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        10: b"/FlateDecode",
    }
    doc = _Document(_wrap_pdf(objs))
    assert 5 not in doc.streams              # image payload never decoded
    assert doc.streams[4] == c_raw           # indirect filter resolved


def test_minipdf_encrypted_raises_and_parser_survives(tmp_path):
    """Encrypted PDFs raise (ciphertext would extract as garbage); the
    built-in parser warns and writes an empty report instead of dying."""
    import pytest
    from rag_challenge_2_tpu.ingestion.minipdf import extract_pdf_pages
    from rag_challenge_2_tpu.ingestion.pdf import PlainTextParser

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [] /Count 0 >>",
    }
    data = _wrap_pdf(
        objs, trailer=b"trailer << /Root 1 0 R /Encrypt 9 0 R >>")
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_pages(data)

    p = tmp_path / "J2024_enc.pdf"
    p.write_bytes(data)
    out_dir = tmp_path / "parsed"
    PlainTextParser(out_dir).parse_and_export([p])
    report = json.loads((out_dir / "J2024_enc.json").read_text("utf-8"))
    assert report["content"] == [] and report["metainfo"]["sha1_name"] == "J2024_enc"


def test_get_parser_kinds(tmp_path):
    """builtin is a first-class kind; unknown kinds fail loudly instead of
    silently picking the fallback parser."""
    import pytest
    from rag_challenge_2_tpu.ingestion.pdf import PlainTextParser, get_parser

    assert isinstance(get_parser(tmp_path, kind="builtin"), PlainTextParser)
    with pytest.raises(ValueError, match="unknown parser kind"):
        get_parser(tmp_path, kind="pdfminer")


def _build_table_pdf() -> bytes:
    """A digital-text page shaped like a financial statement: a title, a
    3-col x 4-row table positioned cell-by-cell with Td (the way office
    print pipelines emit tables), and a footer paragraph."""
    rows = [
        ("item", "2023", "2024"),
        ("Revenue", "1,234", "2,468"),
        ("Margin", "31.5%", "33.1%"),
        ("Orders", "890", "1,020"),
    ]
    ops = [b"BT /F1 10 Tf 1 0 0 1 56 760 Tm (Financial summary) Tj ET"]
    xs = (56, 220, 330)
    y = 720
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            ops.append(b"BT /F1 10 Tf 1 0 0 1 %d %d Tm (%s) Tj ET"
                       % (xs[c], y - 16 * r, cell.encode()))
    ops.append(b"BT /F1 10 Tf 1 0 0 1 56 640 Tm "
               b"(Figures are audited.) Tj ET")
    c1 = b" ".join(ops)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    return _wrap_pdf(objs)


def test_minipdf_detects_table_grid():
    """Geometry-only table recovery (the builtin replacement for docling's
    TableFormer, reference src/pdf_parsing.py:134-162): aligned cell
    origins -> one 4x3 grid; title and footer stay in the flowed text."""
    from rag_challenge_2_tpu.ingestion.minipdf import (
        extract_pdf_pages_structured)

    pages = extract_pdf_pages_structured(_build_table_pdf())
    assert len(pages) == 1
    page = pages[0]
    assert len(page["tables"]) == 1
    grid = page["tables"][0]["data"]
    assert grid["num_rows"] == 4 and grid["num_cols"] == 3
    assert grid["grid"][1][0]["text"] == "Revenue"
    assert grid["grid"][1][2]["text"] == "2,468"
    assert grid["grid"][2][1]["text"] == "31.5%"
    # table lines removed from the flow; prose kept
    assert "Revenue" not in page["text"]
    assert "Financial summary" in page["text"]
    assert "Figures are audited." in page["text"]


def test_plain_text_parser_emits_table_contract(tmp_path):
    """PlainTextParser output feeds merging + serialization: the page body
    carries a table ref, report['tables'] carries markdown/html/grid."""
    from rag_challenge_2_tpu.ingestion.merging import PageTextPreparation
    from rag_challenge_2_tpu.ingestion.pdf import PlainTextParser

    pdf_path = tmp_path / "T2024_tbl.pdf"
    pdf_path.write_bytes(_build_table_pdf())
    out_dir = tmp_path / "parsed"
    PlainTextParser(out_dir).parse_and_export([pdf_path])
    report = json.loads((out_dir / "T2024_tbl.json").read_text("utf-8"))

    assert len(report["tables"]) == 1
    tbl = report["tables"][0]
    assert tbl["#-rows"] == 4 and tbl["#-cols"] == 3
    assert "Revenue" in tbl["markdown"] and "2,468" in tbl["markdown"]
    assert tbl["html"].startswith("<table>") and "31.5%" in tbl["html"]
    refs = [b for p in report["content"] for b in p["content"]
            if b.get("type") == "table"]
    assert refs == [{"type": "table", "table_id": 0}]

    # merging splices the markdown back in by table_id
    merged = PageTextPreparation().process_report(report)
    page_text = merged["content"]["pages"][0]["text"]
    assert "Revenue" in page_text and "2,468" in page_text
    assert "Financial summary" in page_text
