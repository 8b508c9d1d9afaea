"""CPU baselines used ONLY for parity benchmarking, never for serving.

The reference's ANN quality bar is Milvus HNSW (M=16, efConstruction=200,
ef=64 — reference indexing.py:150-153).  ``HNSWBaseline`` is an in-repo
clean-room HNSW so "recall@10 vs HNSW at equal memory" (BASELINE.json)
is a measured row rather than a claim.
"""

from .hnsw import HNSWBaseline

__all__ = ["HNSWBaseline"]
