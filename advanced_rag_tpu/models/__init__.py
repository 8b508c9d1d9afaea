"""On-chip models: bi-encoder embedder, cross-encoder reranker, tokenizer."""

from .cross_encoder import CrossEncoderReranker
from .embedder import Embedder, HashingEmbedder, NeuralEmbedder
from .hf_embedder import HFEmbedder
from .encoder import (
    BiEncoder,
    CrossEncoder,
    EncoderConfig,
    TransformerTrunk,
    init_bi_encoder,
    init_cross_encoder,
)
from .tokenizer import HashingTokenizer, TokenizerConfig

__all__ = [
    "BiEncoder",
    "CrossEncoder",
    "CrossEncoderReranker",
    "Embedder",
    "EncoderConfig",
    "HashingEmbedder",
    "HFEmbedder",
    "HashingTokenizer",
    "NeuralEmbedder",
    "TokenizerConfig",
    "TransformerTrunk",
    "init_bi_encoder",
    "init_cross_encoder",
]
