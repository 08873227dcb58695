"""Semantic-similarity analysis of a document's chunk embeddings.

Equivalent of the reference's ``semantic_similarity_analysis/`` package
(reference semantic_similarity_analysis/generate_similarity_matrix.py):
there the vectors had to be pulled out of FAISS with ``reconstruct_batch``
in chunks of 1000 (:38-64); here the embedding table is a device array, so
the full cosine matrix is ONE matmul on the MXU.  Plotly heatmaps are
emitted when plotly is installed; the numeric artifacts (npz + stats) are
always written.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..index.schema import CorpusIndex, CorpusMeta


def similarity_matrix(index: CorpusIndex, doc_id: int) -> np.ndarray:
    """Full chunk-to-chunk cosine matrix for one document (embeddings are
    unit-norm, so inner product == cosine)."""
    rows = np.nonzero(np.asarray(index.doc_id) == doc_id)[0]
    if len(rows) == 0:
        raise ValueError(f"doc_id {doc_id} has no chunks")
    E = index.emb[jnp.asarray(rows)]
    M = jnp.dot(E, E.T, preferred_element_type=jnp.float32)
    return np.asarray(M)


def matrix_stats(M: np.ndarray) -> Dict:
    off = M[~np.eye(len(M), dtype=bool)] if len(M) > 1 else np.zeros((0,))
    return {
        "n_chunks": int(len(M)),
        "mean_similarity": round(float(off.mean()), 4) if off.size else 0.0,
        "max_similarity": round(float(off.max()), 4) if off.size else 0.0,
        "min_similarity": round(float(off.min()), 4) if off.size else 0.0,
        "p90_similarity": round(float(np.percentile(off, 90)), 4) if off.size else 0.0,
        "high_pairs_gt_0.9": int((off > 0.9).sum() // 2),
    }


def analyze_document(
    index: CorpusIndex,
    meta: CorpusMeta,
    doc_id: int,
    output_dir: Optional[Path] = None,
) -> Dict:
    M = similarity_matrix(index, doc_id)
    stats = matrix_stats(M)
    stats["sha1"] = meta.docs[doc_id].sha1
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        base = output_dir / f"similarity_{meta.docs[doc_id].sha1}"
        np.savez_compressed(f"{base}.npz", matrix=M)
        with open(f"{base}.stats.json", "w", encoding="utf-8") as f:
            json.dump(stats, f, ensure_ascii=False, indent=2)
        try:  # optional interactive heatmap
            import plotly.graph_objects as go

            fig = go.Figure(data=go.Heatmap(z=M, colorscale="Viridis"))
            fig.write_html(f"{base}.html")
            stats["heatmap"] = f"{base}.html"
        except ImportError:
            pass
    return stats
