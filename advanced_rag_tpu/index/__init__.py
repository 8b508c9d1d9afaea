"""Device-resident index layer: corpus store, dense/sparse indexes, manager."""

from .corpus import (
    FILTER_OPERATORS,
    FILTERABLE_FIELDS,
    ChunkRecord,
    CorpusStore,
    stable_hash64,
)
from .dense_index import DenseIndex
from .manager import MultiIndexManager
from .sparse_index import SparseIndex

__all__ = [
    "ChunkRecord",
    "CorpusStore",
    "DenseIndex",
    "FILTERABLE_FIELDS",
    "FILTER_OPERATORS",
    "MultiIndexManager",
    "SparseIndex",
    "stable_hash64",
]
