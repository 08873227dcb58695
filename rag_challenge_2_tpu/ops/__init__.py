from .topk import dense_topk
from .bm25 import bm25_scores
from .aggregate import fuse_hits, FusedCandidates
