"""Standalone BM25 retriever (reference parity) + hybrid fusion helpers.

The reference's ``BM25Retriever`` (reference src/retrieval.py:167-295)
loads per-document pickled BM25Okapi objects, routes by company/years,
scores each document separately, keeps per-doc top-n, optionally dedups to
parent pages, and globally sorts.  Here all of that is one masked device
scoring pass over the corpus CSR index + the shared fusion op.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..index.schema import CorpusIndex, CorpusMeta
from ..ops.aggregate import fuse_hits
from ..ops.bm25 import bm25_scores, encode_queries
from ..ops.topk import NEG_INF
from .routing import route_mask


class BM25Retriever:
    def __init__(self, index: CorpusIndex, meta: CorpusMeta):
        if index.sparse is None:
            raise ValueError("index was built without a sparse term index")
        self.index = index
        self.meta = meta

    def retrieve_by_company_name(
        self,
        company_name: str,
        query: str,
        top_n: int = 3,
        return_parent_pages: bool = False,
        selected_years: Optional[Sequence[int]] = None,
    ) -> List[Dict]:
        cid = self.meta.company_id(company_name)
        if cid < 0:
            raise ValueError(f"No report found with '{company_name}' company name.")
        mask = route_mask(self.index, cid, selected_years)
        qt = encode_queries([query], vocab_bits=self.index.sparse.vocab_bits)
        scores = bm25_scores(self.index.sparse, qt, self.index.n_pad)[0]
        scores = jnp.where(mask, scores, NEG_INF)

        rows = jnp.arange(self.index.n_pad, dtype=jnp.int32)
        key = jnp.where(
            jnp.bool_(return_parent_pages), self.index.page_seg, rows
        )
        cands = fuse_hits(
            key, scores, jnp.zeros_like(rows), jnp.full_like(rows, 3),
            rows, mask & (scores > NEG_INF / 2), top_n=top_n,
        )
        out = []
        keys = np.asarray(cands.key)
        vals = np.asarray(cands.base_sim)
        reps = np.asarray(cands.rep_row)
        pages = np.asarray(self.index.page)
        doc_ids = np.asarray(self.index.doc_id)
        for i in range(len(keys)):
            if keys[i] < 0 or vals[i] <= 0:
                continue
            if return_parent_pages:
                d, pg = self.meta.page_seg_info[int(keys[i])]
                text = self.meta.page_texts.get(int(keys[i]), "")
            else:
                row = int(keys[i])
                d, pg = int(doc_ids[row]), int(pages[row])
                text = self.meta.chunk_texts[row]
            out.append({
                "distance": float(vals[i]),
                "page": int(pg),
                "text": text,
                "source_sha1": self.meta.docs[d].sha1,
                "source_year": self.meta.docs[d].year,
                "rep_row": int(reps[i]),
            })
        return out
