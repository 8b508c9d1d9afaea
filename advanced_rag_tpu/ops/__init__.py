"""Device ops: fused scoring, top-k, fusion, sparse BM25, hybrid program."""

from .dense import NEG_INF, cdiv, dense_topk, dense_topk_approx, l2_normalize, merge_topk
from .fusion import mmr_select, recency_boost, rrf_fuse
from .hybrid import HybridResult, hybrid_retrieve
from .sparse import idf_weights, sparse_topk

__all__ = [
    "NEG_INF",
    "cdiv",
    "dense_topk",
    "dense_topk_approx",
    "l2_normalize",
    "merge_topk",
    "mmr_select",
    "recency_boost",
    "rrf_fuse",
    "sparse_topk",
    "idf_weights",
    "hybrid_retrieve",
    "HybridResult",
]
