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

__all__ = [
    "__version__",
    "IndexConfig",
    "IndexType",
    "MeshConfig",
    "Metric",
    "PipelineConfig",
    "RetrievalConfig",
    "load_component_configs",
    "load_pipeline_config",
    "load_yaml_config",
]
