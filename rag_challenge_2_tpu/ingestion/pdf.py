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
  * :class:`PlainTextParser` — ``.txt`` files with form-feed page breaks,
    for corpora already extracted elsewhere;
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
    """``.txt`` per document, ``\\f`` (form feed) separating pages."""

    def __init__(self, output_dir: Path, metadata_path: Optional[Path] = None):
        self.output_dir = Path(output_dir)
        self.metadata = pd.read_csv(metadata_path) if metadata_path else None

    def parse_file(self, path: Path) -> Dict:
        text = Path(path).read_text(encoding="utf-8")
        pages = []
        for i, page_text in enumerate(text.split("\f")):
            blocks = [
                {"type": "text", "text": para.strip()}
                for para in page_text.split("\n\n")
                if para.strip()
            ]
            pages.append({"page": i + 1, "content": blocks, "page_dimensions": {}})
        return {
            "metainfo": _metainfo_for(Path(path).stem, self.metadata),
            "content": normalize_page_sequence(pages),
            "tables": [],
            "pictures": [],
        }

    def parse_and_export(self, input_paths: List[Path]) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        for p in input_paths:
            report = self.parse_file(p)
            out = self.output_dir / f"{Path(p).stem}.json"
            with open(out, "w", encoding="utf-8") as f:
                json.dump(report, f, ensure_ascii=False, indent=2)


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
        """Docling dict → parsed-report contract (flattened blocks per page,
        tables with markdown/html) — role of reference JsonReportProcessor
        :364-651."""
        pages: Dict[int, Dict] = {}
        for item in data.get("texts", []):
            for prov in item.get("prov", []):
                pno = prov.get("page_no", 1)
                pages.setdefault(pno, {"page": pno, "content": [], "page_dimensions": {}})
                pages[pno]["content"].append({
                    "type": item.get("label", "text"),
                    "text": item.get("text", ""),
                })
        tables = []
        for ti, tbl in enumerate(data.get("tables", [])):
            prov = (tbl.get("prov") or [{}])[0]
            tables.append({
                "table_id": ti,
                "page": prov.get("page_no", 1),
                "markdown": tbl.get("data", {}).get("markdown", ""),
                "html": tbl.get("data", {}).get("html", ""),
            })
            pno = prov.get("page_no", 1)
            pages.setdefault(pno, {"page": pno, "content": [], "page_dimensions": {}})
            pages[pno]["content"].append({"type": "table", "table_id": ti, "text": ""})
        return {
            "metainfo": _metainfo_for(sha1, self.metadata),
            "content": normalize_page_sequence(sorted(pages.values(), key=lambda p: p["page"])),
            "tables": tables,
            "pictures": [],
        }


def get_parser(output_dir: Path, metadata_path: Optional[Path] = None, kind: str = "auto"):
    if kind == "docling" or (kind == "auto" and _docling_available()):
        return DoclingParser(output_dir, metadata_path)
    return PlainTextParser(output_dir, metadata_path)
