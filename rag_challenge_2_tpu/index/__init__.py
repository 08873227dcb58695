from .schema import CorpusIndex, CorpusMeta, SparseIndex
from .build import build_corpus_index, load_chunked_reports
from .store import save_index, load_index
