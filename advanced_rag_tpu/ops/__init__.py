"""Device ops: fused scoring, top-k, fusion, sparse BM25, IVF kernels."""

from .dense import NEG_INF, cdiv, dense_topk, dense_topk_approx, l2_normalize, merge_topk
from .fusion import mmr_select, recency_boost, rrf_fuse

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
]
