"""Integration: cross-encoder rerank path, learned-ranker rerank path,
domain index retrieval, NeuralEmbedder-backed pipeline."""

import numpy as np
import pytest

from advanced_rag_tpu.config import PipelineConfig, RetrievalConfig
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker
from advanced_rag_tpu.models.embedder import NeuralEmbedder
from advanced_rag_tpu.models.encoder import EncoderConfig
from advanced_rag_tpu.pipeline import AdvancedRAGPipeline, LearnedRanker
from advanced_rag_tpu.pipeline.retrieval import HybridRetriever

# heavy compiles / large corpora: nightly + pre-merge (pytest -m slow)
pytestmark = __import__("pytest").mark.slow

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


def test_hf_cross_encoder_local_checkpoint(tmp_path):
    """Build a tiny local seq-classification checkpoint offline and run
    it through HFCrossEncoder (zero-egress: local_files_only path)."""
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, BertTokenizerFast
    from transformers import FlaxBertForSequenceClassification

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "tpu", "kernel", "retrieval", "dense", "sparse", "the", "a"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
    tok.save_pretrained(tmp_path)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64,
                     num_labels=1)
    model = FlaxBertForSequenceClassification(cfg, seed=0)
    model.save_pretrained(tmp_path)

    from advanced_rag_tpu.models.hf_cross_encoder import HFCrossEncoder

    ce = HFCrossEncoder(str(tmp_path), max_len=32, max_batch=4)
    scores = ce.score("tpu kernel", ["dense retrieval", "sparse retrieval",
                                     "the a the"])
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    # pairwise API parity with models/cross_encoder.py
    s2 = ce.score_pairs(["tpu", "kernel"], ["dense", "sparse"])
    assert s2.shape == (2,) and np.isfinite(s2).all()


def test_hf_embedder_local_checkpoint(tmp_path):
    pytest.importorskip("transformers")
    from transformers import BertConfig, BertTokenizerFast, FlaxBertModel

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "tpu", "kernel", "retrieval", "dense", "sparse"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt")) \
        .save_pretrained(tmp_path)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    FlaxBertModel(cfg, seed=0).save_pretrained(tmp_path)

    from advanced_rag_tpu.models.hf_embedder import HFEmbedder

    emb = HFEmbedder(str(tmp_path), max_len=16, max_batch=4)
    assert emb.dim == 32
    v = emb.encode(["tpu kernel", "dense retrieval", "sparse"])
    assert v.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    # deterministic: same text -> same embedding
    v2 = emb.encode(["tpu kernel"])
    np.testing.assert_allclose(v[0], v2[0], rtol=1e-5)
