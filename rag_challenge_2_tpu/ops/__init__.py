from .aggregate import FusedCandidates, fuse_hits
from .bm25 import bm25_scores, encode_queries
from .kmeans import assign_clusters, kmeans
from .topk import dense_topk
