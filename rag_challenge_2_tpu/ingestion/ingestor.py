"""Chunked reports + embedder → on-device corpus index.

The role of the reference's ``VectorDBIngestor`` / ``BM25Ingestor``
(reference src/ingestion.py): embed every chunk and build the searchable
index.  Differences by design: embeddings come from any callable
(the on-device encoder by default — BASELINE.md config 4 — or a remote
API client), and the output is ONE CorpusIndex npz instead of per-document
faiss/pkl files; the BM25 CSR index is built inside ``build_corpus_index``
from the same chunk texts.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..index import CorpusIndex, CorpusMeta, build_corpus_index, save_index
from ..index.build import load_chunked_reports


class CorpusIngestor:
    def __init__(
        self,
        embedder: Callable[[List[str]], np.ndarray],
        batch_size: int = 256,
        with_sparse: bool = True,
        vocab_bits: int = 20,
    ):
        self.embedder = embedder
        self.batch_size = batch_size
        self.with_sparse = with_sparse
        self.vocab_bits = vocab_bits

    def embed_reports(self, reports: List[Dict]) -> List[np.ndarray]:
        """Batched embedding of every chunk, per document (row order matches
        chunk order — the contract reference src/ingestion.py:79-84 keeps)."""
        out = []
        for rep in reports:
            texts = [c["text"] for c in rep["content"]["chunks"]]
            embs = self.embedder(texts) if texts else np.zeros((0, 1), np.float32)
            out.append(np.asarray(embs, np.float32))
        return out

    def build(
        self, reports: List[Dict]
    ) -> Tuple[CorpusIndex, CorpusMeta]:
        embs = self.embed_reports(reports)
        return build_corpus_index(
            reports, embs, with_sparse=self.with_sparse, vocab_bits=self.vocab_bits
        )

    def process_reports(self, chunked_dir: Path, output_path: Path) -> None:
        """Directory of chunked-report JSONs → one index npz (+ sidecar)."""
        reports = load_chunked_reports(Path(chunked_dir))
        idx, meta = self.build(reports)
        save_index(Path(output_path), idx, meta)
