"""advanced_rag_tpu — a TPU-native RAG framework.

A from-scratch rebuild of the capabilities of rnaarla/advanced-rag-milvus
on JAX/XLA/Pallas/pjit: the vector index is device-resident HBM arrays,
search/fusion/rerank are jitted programs, and corpus scale comes from
sharding over a TPU mesh with ICI top-k reduction (see SURVEY.md).
"""

__version__ = "0.1.0"

from .config import (
    IndexConfig,
    IndexType,
    MeshConfig,
    Metric,
    PipelineConfig,
    RetrievalConfig,
    load_component_configs,
    load_pipeline_config,
    load_yaml_config,
)
from .index import ChunkRecord, CorpusStore, DenseIndex, MultiIndexManager, SparseIndex
from .pipeline import (
    AdaptiveChunker,
    AdvancedRAGPipeline,
    ComplianceManager,
    DocumentDiagnostics,
    ExperimentManager,
    HybridRetriever,
    LearnedHybridAdapter,
    LearnedRanker,
    QueryClassifier,
    QueryDecomposer,
    QueryRewriter,
    RAGEvaluator,
    RetrievalResult,
    SemanticEnricher,
)
from .utils.exceptions import AdvancedRAGException, RAGException

__all__ = [
    "__version__",
    "AdaptiveChunker",
    "AdvancedRAGException",
    "AdvancedRAGPipeline",
    "ChunkRecord",
    "ComplianceManager",
    "CorpusStore",
    "DenseIndex",
    "DocumentDiagnostics",
    "ExperimentManager",
    "HybridRetriever",
    "IndexConfig",
    "IndexType",
    "LearnedHybridAdapter",
    "LearnedRanker",
    "MeshConfig",
    "Metric",
    "MultiIndexManager",
    "PipelineConfig",
    "QueryClassifier",
    "QueryDecomposer",
    "QueryRewriter",
    "RAGEvaluator",
    "RAGException",
    "RetrievalConfig",
    "RetrievalResult",
    "SemanticEnricher",
    "SparseIndex",
    "load_component_configs",
    "load_pipeline_config",
    "load_yaml_config",
]
