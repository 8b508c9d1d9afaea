"""Integration: cross-encoder rerank path, learned-ranker rerank path,
domain index retrieval, NeuralEmbedder-backed pipeline."""

import numpy as np

from advanced_rag_tpu.config import PipelineConfig, RetrievalConfig
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker
from advanced_rag_tpu.models.embedder import NeuralEmbedder
from advanced_rag_tpu.models.encoder import EncoderConfig
from advanced_rag_tpu.pipeline import AdvancedRAGPipeline, LearnedRanker
from advanced_rag_tpu.pipeline.retrieval import HybridRetriever

TINY = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=2,
                     num_heads=4, mlp_dim=64, max_len=32)

DOCS = [
    {"doc_id": "tpu", "content": "TPU systolic arrays excel at matrix "
     "multiplication on the MXU with bfloat16 tiles."},
    {"doc_id": "rag", "content": "Hybrid retrieval fuses dense embeddings "
     "with sparse BM25 scores via reciprocal rank fusion."},
]


def test_cross_encoder_rerank_path():
    pipe = AdvancedRAGPipeline(PipelineConfig())
    pipe.retriever.reranker = CrossEncoderReranker(TINY, max_batch=16)
    pipe.ingest_documents(DOCS)
    out = pipe.retrieve("hybrid retrieval fusion")
    assert out["results"]
    assert all("rerank_score" in r.metadata for r in out["results"])


def test_learned_ranker_rerank_path():
    pipe = AdvancedRAGPipeline(PipelineConfig())
    pipe.retriever.learned_ranker = LearnedRanker()
    pipe.ingest_documents(DOCS)
    out = pipe.retrieve("matrix multiplication tiles")
    assert out["results"]
    assert out["results"][0].metadata["rerank_position"] == 0


def test_domain_index_pipeline():
    cfg = PipelineConfig(enable_domain=True, domain_dim=64)
    cfg.retrieval.enable_domain = True
    pipe = AdvancedRAGPipeline(cfg)
    pipe.ingest_documents(DOCS)
    out = pipe.retrieve("reciprocal rank fusion")
    assert out["results"]
    stats = pipe.index_manager.get_collection_stats()
    assert "domain" in stats and stats["domain"]["rows"] > 0


def test_neural_embedder_pipeline():
    embedder = NeuralEmbedder(dim=32, config=TINY, max_batch=16)
    manager = MultiIndexManager(PipelineConfig(semantic_dim=32),
                                embedder=embedder)
    pipe = AdvancedRAGPipeline(
        PipelineConfig(semantic_dim=32), index_manager=manager)
    pipe.ingest_documents(DOCS)
    out = pipe.retrieve("sparse scores fused with dense")
    assert out["results"]
    # untrained model: results exist and scores are finite
    assert np.isfinite(out["results"][0].score)


def test_cross_encoder_scores_shape():
    ce = CrossEncoderReranker(TINY, max_batch=8)
    scores = ce.score("query text", ["doc one", "doc two", "doc three"])
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    assert ce.score("q", []).shape == (0,)
