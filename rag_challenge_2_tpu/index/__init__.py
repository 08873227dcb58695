from .build import build_corpus_index, infer_doc_year, load_chunked_reports
from .ivf import IVFIndex, build_ivf, ivf_search
from .schema import CorpusIndex, CorpusMeta, DocMeta, SparseIndex
from .store import (
    index_fingerprint,
    load_index,
    load_ivf,
    quantize_index,
    save_index,
    save_ivf,
)
