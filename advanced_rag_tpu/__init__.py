"""advanced_rag_tpu — a TPU-native RAG framework.

A from-scratch rebuild of the capabilities of rnaarla/advanced-rag-milvus
on JAX/XLA/Pallas/pjit: the vector index is device-resident HBM arrays,
search/fusion/rerank are jitted programs, and corpus scale comes from
sharding over a TPU mesh with ICI top-k reduction (see SURVEY.md).
"""

__version__ = "0.2.0"

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
from .models.cross_encoder import CrossEncoderReranker
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
from .pipeline.chunking import Chunk, ChunkMetadata
from .pipeline.compliance import AuditEventType, AuditLog, DocumentVersion
from .pipeline.diagnostics import DiagnosticMetrics
from .pipeline.enrichment import EnrichmentResult
from .pipeline.evaluation import DriftReport, EvaluationMetrics
from .pipeline.orchestrator import PipelineStage
from .pipeline.query_ops import DecompositionResult
from .pipeline.ranker import LearnedRankerConfig
from .utils.exceptions import AdvancedRAGException, RAGException

# Migration alias: the reference exposes its index layer as
# ``MilvusIndexManager`` (indexing.py:80).  The device-resident manager
# is API-compatible at the surface that matters (index_chunks / search /
# delete_by_filter / get_collection_stats / close / _generate_*), so
# imports written against the reference keep working.
MilvusIndexManager = MultiIndexManager

__all__ = [
    "__version__",
    "AdaptiveChunker",
    "AuditEventType",
    "AuditLog",
    "Chunk",
    "ChunkMetadata",
    "CrossEncoderReranker",
    "DecompositionResult",
    "DiagnosticMetrics",
    "DocumentVersion",
    "DriftReport",
    "EnrichmentResult",
    "EvaluationMetrics",
    "LearnedRankerConfig",
    "MilvusIndexManager",
    "PipelineStage",
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
