"""Device ops: fused scoring, top-k, fusion, sparse BM25, IVF, SQ8,
hybrid program."""

from .dense import NEG_INF, cdiv, dense_topk, dense_topk_approx, l2_normalize, merge_topk
from .fusion import mmr_select, recency_boost, rrf_fuse
from .e2e import E2EResult, make_retrieve_rerank
from .hybrid import HybridResult, hybrid_retrieve
from .ivf import IVFPartitions, auto_nlist, build_ivf, ivf_topk, tune_nprobe
from .ivfpq import IVFPQIndex, build_ivfpq, ivfpq_append_tail, ivfpq_topk
from .postings import auto_postings_cap, build_postings, postings_topk
from .pq import (
    PQCodebook,
    auto_pq_m,
    pq_decode,
    pq_encode,
    pq_encode_device,
    pq_topk,
    pq_train,
)
from .quant import (
    dense_topk_sq8,
    dense_topk_sq8_approx,
    sq8_quantize,
    sq8_quantize_host,
)
from .sparse import idf_weights, sparse_topk

__all__ = [
    "NEG_INF",
    "cdiv",
    "dense_topk",
    "dense_topk_approx",
    "dense_topk_sq8",
    "dense_topk_sq8_approx",
    "l2_normalize",
    "merge_topk",
    "mmr_select",
    "recency_boost",
    "rrf_fuse",
    "sparse_topk",
    "idf_weights",
    "hybrid_retrieve",
    "HybridResult",
    "IVFPartitions",
    "auto_nlist",
    "E2EResult",
    "make_retrieve_rerank",
    "auto_postings_cap",
    "build_ivf",
    "build_postings",
    "IVFPQIndex",
    "build_ivfpq",
    "ivfpq_append_tail",
    "ivfpq_topk",
    "ivf_topk",
    "postings_topk",
    "PQCodebook",
    "auto_pq_m",
    "pq_decode",
    "pq_encode",
    "pq_encode_device",
    "pq_topk",
    "pq_train",
    "sq8_quantize",
    "sq8_quantize_host",
    "tune_nprobe",
]
