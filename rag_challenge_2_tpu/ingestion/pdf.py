"""PDF → parsed-report JSON.

The reference's parser (reference src/pdf_parsing.py, 651 LoC) is a docling
pipeline: layout + TableFormer table structure, page-sequence
normalisation, spawn-based multi-process parallelism, and a
``JsonReportProcessor`` that assembles ``{metainfo, content, tables,
pictures}``.  Docling is a host-side torch dependency and is OPTIONAL
here — the TPU framework defines the *contract* and provides three
sources:

  * :class:`DoclingParser` — the full pipeline when docling is installed
    (layout models, OCR options, GPU detection are docling's own);
  * :class:`PlainTextParser` — the built-in fallback: ``.txt`` files with
    form-feed page breaks, and digital-text ``.pdf`` files through the
    dependency-free extractor in :mod:`.minipdf` (FlateDecode + ToUnicode
    CMaps, so CJK annual reports extract without docling);
  * pre-parsed JSON is consumed directly by downstream stages.

All emit the same parsed-report JSON the merger/splitter consume.
"""

from __future__ import annotations

import json
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd


def _metainfo_for(sha1_name: str, metadata: Optional[pd.DataFrame]) -> Dict:
    """subset.csv lookup: sha1 → company_name / year
    (reference src/pdf_parsing.py:380-410 uses csv metadata the same way)."""
    info = {"sha1_name": sha1_name}
    if metadata is not None:
        row = metadata[metadata["sha1"] == sha1_name]
        if len(row):
            rec = row.iloc[0].to_dict()
            info["company_name"] = rec.get("company_name", "")
            if "year" in rec and not pd.isna(rec.get("year")):
                info["year"] = int(rec["year"])
    return info


def normalize_page_sequence(pages: List[Dict]) -> List[Dict]:
    """Fill gaps in page numbering with empty pages
    (reference src/pdf_parsing.py:195-224)."""
    if not pages:
        return pages
    by_num = {p["page"]: p for p in pages}
    out = []
    for n in range(1, max(by_num) + 1):
        out.append(by_num.get(n, {"page": n, "content": [], "page_dimensions": {}}))
    return out


class PlainTextParser:
    """The built-in (docling-free) parser: ``.txt`` per document with ``\\f``
    (form feed) page breaks, and — via :mod:`.minipdf` — digital-text
    ``.pdf`` files (FlateDecode streams, ToUnicode CMaps for CJK; scanned
    PDFs still need docling's OCR)."""

    def __init__(self, output_dir: Path, metadata_path: Optional[Path] = None):
        self.output_dir = Path(output_dir)
        self.metadata = pd.read_csv(metadata_path) if metadata_path else None

    def parse_file(self, path: Path) -> Dict:
        page_tables: List[List[Dict]] = []
        if Path(path).suffix.lower() == ".pdf":
            from .minipdf import extract_pdf_pages_structured

            structured = extract_pdf_pages_structured(Path(path).read_bytes())
            page_texts = [p["text"] for p in structured]
            page_tables = [p["tables"] for p in structured]
        else:
            page_texts = Path(path).read_text(encoding="utf-8").split("\f")
        pages = []
        tables: List[Dict] = []
        for i, page_text in enumerate(page_texts):
            blocks = [
                {"type": "text", "text": para.strip()}
                for para in page_text.split("\n\n")
                if para.strip()
            ]
            # geometry-detected grids (minipdf._detect_tables) take the
            # docling table contract: a {type: table, table_id} ref in the
            # page body + full markdown/html/grid in report["tables"], so
            # merging (table_id splice), serialization (tables.py) and the
            # serialized-table chunk type all work without docling
            for tbl in (page_tables[i] if i < len(page_tables) else []):
                tid = len(tables)
                blocks.append({"type": "table", "table_id": tid})
                bbox = tbl.get("bbox", {})
                tdata = tbl["data"]
                tables.append({
                    "table_id": tid,
                    "page": i + 1,
                    "bbox": [bbox.get(k, 0) for k in ("l", "t", "r", "b")],
                    "#-rows": tdata["num_rows"],
                    "#-cols": tdata["num_cols"],
                    "markdown": _table_to_md(tbl),
                    "html": _table_to_html(tbl),
                    "json": tdata,
                })
            pages.append({"page": i + 1, "content": blocks, "page_dimensions": {}})
        return {
            "metainfo": _metainfo_for(Path(path).stem, self.metadata),
            "content": normalize_page_sequence(pages),
            "tables": tables,
            "pictures": [],
        }

    def parse_and_export(self, input_paths: List[Path]) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        for p in input_paths:
            try:
                report = self.parse_file(p)
            except Exception as e:
                # one bad file (encrypted PDF, malformed bytes) must not
                # kill the corpus parse — the reference likewise survives
                # per-chunk failures (src/pdf_parsing.py:335-353)
                print(f"[WARNING] failed to parse {p}: {e}; "
                      "writing empty report")
                try:
                    metainfo = _metainfo_for(Path(p).stem, self.metadata)
                except Exception:   # the fallback itself must not raise
                    metainfo = {"sha1_name": Path(p).stem}
                report = {
                    "metainfo": metainfo,
                    "content": [],
                    "tables": [],
                    "pictures": [],
                }
            out = self.output_dir / f"{Path(p).stem}.json"
            with open(out, "w", encoding="utf-8") as f:
                json.dump(report, f, ensure_ascii=False, indent=2)


# --------------------------------------------------------------------------
# Docling-dict → parsed-report assembly (contract of reference
# src/pdf_parsing.py:364-651 JsonReportProcessor).  Module-level and driven
# purely by docling's ``export_to_dict`` structure so it is testable from a
# captured fixture JSON without docling installed.

def _process_text_reference(ref_num: int, data: Dict) -> Dict:
    """Text block with identity + provenance fields
    (reference src/pdf_parsing.py:439-468)."""
    text_item = data["texts"][ref_num]
    item = {
        "text": text_item.get("text", ""),
        "type": text_item.get("label", "text"),
        "text_id": ref_num,
    }
    orig = text_item.get("orig", "")
    if orig != text_item.get("text", ""):
        item["orig"] = orig
    for key in ("enumerated", "marker"):
        if key in text_item:
            item[key] = text_item[key]
    return item


def _expand_groups(body_children: List, groups: List, _depth: int = 0) -> List:
    """Inline group members with their group identity, RECURSIVELY —
    docling nests groups (a list inside a list); a non-recursive pass
    would emit the inner group ref as a plain item and its text would
    silently vanish from every page (reference src/pdf_parsing.py:411-437)."""
    if _depth > 16:  # defensive: malformed self-referencing groups
        return []
    out = []
    for item in body_children:
        ref = item.get("$ref") if isinstance(item, dict) else None
        if ref:
            ref_type, ref_num = ref.split("/")[-2:]
            if ref_type == "groups":
                group = groups[int(ref_num)]
                for c in _expand_groups(group.get("children", []), groups, _depth + 1):
                    c = dict(c)
                    c.setdefault("group_id", int(ref_num))
                    c.setdefault("group_name", group.get("name", ""))
                    c.setdefault("group_label", group.get("label", ""))
                    out.append(c)
                continue
        out.append(item)
    return out


def _bbox_list(prov: Dict) -> List:
    b = prov.get("bbox", {})
    return [b.get("l"), b.get("t"), b.get("r"), b.get("b")] if b else []


def _table_to_md(table_data: Dict) -> str:
    """Grid cells → github markdown (reference src/pdf_parsing.py:586-608)."""
    from tabulate import tabulate

    grid = table_data.get("data", {}).get("grid", [])
    rows = [[cell.get("text", "") for cell in row] for row in grid]
    if len(rows) > 1 and rows[0]:
        try:
            return tabulate(rows[1:], headers=rows[0], tablefmt="github")
        except ValueError:
            return tabulate(rows[1:], headers=rows[0], tablefmt="github",
                            disable_numparse=True)
    return tabulate(rows, tablefmt="github")


def _table_to_html(table_data: Dict) -> str:
    """Grid cells → HTML with row/col spans (role of docling's
    ``export_to_html`` — the table-serialization LLM stage consumes this,
    reference src/tables_serialization.py:106-134)."""
    grid = table_data.get("data", {}).get("grid", [])
    seen = set()
    rows_html = []
    for r, row in enumerate(grid):
        cells = []
        for c, cell in enumerate(row):
            key = (cell.get("start_row_offset_idx", r), cell.get("start_col_offset_idx", c))
            if key in seen:
                continue  # continuation of a spanned cell
            seen.add(key)
            rs = cell.get("row_span", 1)
            cs = cell.get("col_span", 1)
            tag = "th" if cell.get("column_header") or cell.get("row_header") else "td"
            attrs = (f" rowspan=\"{rs}\"" if rs > 1 else "") + (
                f" colspan=\"{cs}\"" if cs > 1 else "")
            text = (cell.get("text", "")
                    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
            cells.append(f"<{tag}{attrs}>{text}</{tag}>")
        rows_html.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows_html) + "</table>"


def assemble_report(data: Dict, sha1_name: str, metadata=None) -> Dict:
    """Docling ``export_to_dict`` → the parsed-report contract, preserving
    body order, group identity, table cell structure (markdown + HTML +
    grid JSON + bbox + shape), pictures with their text children, and page
    dimensions (reference JsonReportProcessor, src/pdf_parsing.py:369-651)."""
    texts = data.get("texts", [])
    raw_tables = data.get("tables", [])
    raw_pictures = data.get("pictures", [])

    metainfo = _metainfo_for(sha1_name, metadata)
    metainfo.update({
        "pages_amount": len(data.get("pages", [])),
        "text_blocks_amount": len(texts),
        "tables_amount": len(raw_tables),
        "pictures_amount": len(raw_pictures),
        "equations_amount": len(data.get("equations", [])),
        "footnotes_amount": len([t for t in texts if t.get("label") == "footnote"]),
    })

    pages: Dict[int, Dict] = {}

    def page_for(prov: Dict) -> Dict:
        pno = prov.get("page_no", 1)
        if pno not in pages:
            pages[pno] = {
                "page": pno,
                "content": [],
                # the first item's prov bbox, NOT the page size — this
                # mirrors the reference contract exactly
                # (reference src/pdf_parsing.py:503,522,541)
                "page_dimensions": prov.get("bbox", {}),
            }
        return pages[pno]

    body = _expand_groups(data.get("body", {}).get("children", []),
                          data.get("groups", []))
    for item in body:
        ref = item.get("$ref") if isinstance(item, dict) else None
        if not ref:
            continue
        ref_type, ref_num = ref.split("/")[-2:]
        ref_num = int(ref_num)
        if ref_type == "texts":
            text_item = texts[ref_num]
            content = _process_text_reference(ref_num, data)
            for key in ("group_id", "group_name", "group_label"):
                if key in item:
                    content[key] = item[key]
            if text_item.get("prov"):
                page_for(text_item["prov"][0])["content"].append(content)
        elif ref_type == "tables":
            tbl = raw_tables[ref_num]
            if tbl.get("prov"):
                page_for(tbl["prov"][0])["content"].append(
                    {"type": "table", "table_id": ref_num}
                )
        elif ref_type == "pictures":
            pic = raw_pictures[ref_num]
            if pic.get("prov"):
                page_for(pic["prov"][0])["content"].append(
                    {"type": "picture", "picture_id": ref_num}
                )

    tables = []
    for tbl in raw_tables:
        prov = (tbl.get("prov") or [{}])[0]
        ref_num = int(tbl.get("self_ref", "#/tables/0").split("/")[-1])
        tdata = tbl.get("data", {})
        tables.append({
            "table_id": ref_num,
            "page": prov.get("page_no", 1),
            "bbox": _bbox_list(prov),
            "#-rows": tdata.get("num_rows", len(tdata.get("grid", []))),
            "#-cols": tdata.get("num_cols",
                                len(tdata.get("grid", [[]])[0]) if tdata.get("grid") else 0),
            "markdown": _table_to_md(tbl),
            "html": _table_to_html(tbl),
            "json": tdata,
        })

    pictures = []
    for pic in raw_pictures:
        prov = (pic.get("prov") or [{}])[0]
        ref_num = int(pic.get("self_ref", "#/pictures/0").split("/")[-1])
        children = []
        for child in pic.get("children", []):
            ref = child.get("$ref") if isinstance(child, dict) else None
            if ref:
                ref_type, rn = ref.split("/")[-2:]
                if ref_type == "texts":
                    children.append(_process_text_reference(int(rn), data))
        pictures.append({
            "picture_id": ref_num,
            "page": prov.get("page_no", 1),
            "bbox": _bbox_list(prov),
            "children": children,
        })

    return {
        "metainfo": metainfo,
        "content": normalize_page_sequence(
            sorted(pages.values(), key=lambda p: p["page"])
        ),
        "tables": tables,
        "pictures": pictures,
    }


def _docling_available() -> bool:
    try:
        import docling  # noqa: F401

        return True
    except ImportError:
        return False


class DoclingParser:
    """Docling-backed parser (contract of reference src/pdf_parsing.py:75-361).

    Import-gated: constructing it without docling installed raises with a
    clear message instead of failing at call time.
    """

    def __init__(
        self,
        output_dir: Path,
        metadata_path: Optional[Path] = None,
        table_mode_accurate: bool = True,
        do_ocr: bool = False,
    ):
        if not _docling_available():
            raise ImportError(
                "docling is not installed; use PlainTextParser or pre-parsed "
                "JSON (the rest of the pipeline only needs the parsed-report "
                "contract)"
            )
        self.output_dir = Path(output_dir)
        self.metadata = pd.read_csv(metadata_path) if metadata_path else None
        self.table_mode_accurate = table_mode_accurate
        self.do_ocr = do_ocr

    def _converter(self):
        from docling.datamodel.base_models import InputFormat
        from docling.datamodel.pipeline_options import (
            PdfPipelineOptions,
            TableFormerMode,
        )
        from docling.document_converter import DocumentConverter, PdfFormatOption

        opts = PdfPipelineOptions()
        opts.do_table_structure = True
        opts.table_structure_options.mode = (
            TableFormerMode.ACCURATE if self.table_mode_accurate else TableFormerMode.FAST
        )
        opts.table_structure_options.do_cell_matching = True
        opts.do_ocr = self.do_ocr
        return DocumentConverter(
            format_options={InputFormat.PDF: PdfFormatOption(pipeline_options=opts)}
        )

    def parse_and_export(self, input_paths: List[Path]) -> None:
        converter = self._converter()
        self.output_dir.mkdir(parents=True, exist_ok=True)
        for result in converter.convert_all(input_paths, raises_on_error=True):
            data = result.document.export_to_dict()
            sha1 = Path(result.input.file).stem
            report = self._assemble(data, sha1)
            with open(self.output_dir / f"{sha1}.json", "w", encoding="utf-8") as f:
                json.dump(report, f, ensure_ascii=False, indent=2)

    def parse_and_export_parallel(
        self, input_paths: List[Path], chunk_size: int = 2, max_workers: int = 4
    ) -> None:
        """spawn-based process pool (reference :247-361 — spawn keeps CUDA
        contexts out of forked children)."""
        import multiprocessing as mp

        chunks = [
            input_paths[i : i + chunk_size]
            for i in range(0, len(input_paths), chunk_size)
        ]
        ctx = mp.get_context("spawn")
        with ProcessPoolExecutor(max_workers=max_workers, mp_context=ctx) as ex:
            list(ex.map(self.parse_and_export, chunks))

    def _assemble(self, data: Dict, sha1: str) -> Dict:
        return assemble_report(data, sha1, self.metadata)


def get_parser(output_dir: Path, metadata_path: Optional[Path] = None, kind: str = "auto"):
    if kind not in ("auto", "docling", "builtin", "text"):
        raise ValueError(f"unknown parser kind {kind!r} "
                         "(expected auto/docling/builtin)")
    if kind == "docling" or (kind == "auto" and _docling_available()):
        return DoclingParser(output_dir, metadata_path)
    return PlainTextParser(output_dir, metadata_path)
