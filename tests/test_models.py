"""Model layer: tokenizer determinism, embedder shapes/normalization,
similarity sanity, cross-encoder scoring."""

import numpy as np
import pytest

from advanced_rag_tpu.models import (
    CrossEncoderReranker,
    EncoderConfig,
    HashingEmbedder,
    HashingTokenizer,
    NeuralEmbedder,
    TokenizerConfig,
)

SMALL = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=2,
                      num_heads=4, mlp_dim=64, max_len=32)


def test_tokenizer_deterministic_and_padded():
    tok = HashingTokenizer(TokenizerConfig(vocab_size=1024, max_len=16))
    ids1, m1 = tok.encode_batch(["hello world", "a much longer sentence here"])
    ids2, m2 = tok.encode_batch(["hello world", "a much longer sentence here"])
    assert (ids1 == ids2).all()
    assert ids1.shape == (2, 16)
    assert m1[0].sum() == 4  # CLS hello world SEP
    assert ids1[0, 0] == 1 and ids1[0, 3] == 2  # CLS ... SEP


def test_tokenizer_pairs_segments():
    tok = HashingTokenizer(TokenizerConfig(vocab_size=1024, max_len=32))
    ids, mask, segs = tok.encode_pairs(["what is tpu"], ["tpu is a chip"])
    assert segs[0, 0] == 0
    live = int(mask[0].sum())
    assert segs[0, live - 1] == 1  # doc segment
    assert ids[0, live - 1] == 2   # trailing SEP


def test_neural_embedder_shapes_and_norm():
    emb = NeuralEmbedder(dim=16, config=SMALL, max_batch=4)
    out = emb.encode(["doc one", "doc two", "doc three"])
    assert out.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
    # deterministic
    out2 = emb.encode(["doc one", "doc two", "doc three"])
    np.testing.assert_allclose(out, out2, atol=1e-6)
    # empty input
    assert emb.encode([]).shape == (0, 16)


def test_neural_embedder_batch_padding_no_leak():
    emb = NeuralEmbedder(dim=8, config=SMALL, max_batch=8)
    single = emb.encode(["alpha"])
    batch = emb.encode(["alpha", "beta", "gamma"])
    np.testing.assert_allclose(single[0], batch[0], atol=1e-5)


def test_hashing_embedder_similarity_orders_correctly():
    emb = HashingEmbedder(dim=64, vocab_size=2048, doc_nnz=32)
    vecs = emb.encode([
        "tpu matrix multiplication hardware",
        "tpu matrix multiplication systolic hardware unit",
        "completely unrelated cooking recipe with tomatoes",
    ])
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    sim_related = vecs[0] @ vecs[1]
    sim_unrelated = vecs[0] @ vecs[2]
    assert sim_related > sim_unrelated + 0.2


def test_hashing_embedder_deterministic_across_instances():
    a = HashingEmbedder(dim=32, vocab_size=512, doc_nnz=16, seed=7)
    b = HashingEmbedder(dim=32, vocab_size=512, doc_nnz=16, seed=7)
    np.testing.assert_allclose(a.encode(["same text"]), b.encode(["same text"]),
                               atol=1e-6)


def test_cross_encoder_scores():
    rr = CrossEncoderReranker(config=SMALL, max_batch=4)
    s = rr.score("what is a tpu", ["a tpu is an accelerator",
                                   "bananas are yellow",
                                   "tpus multiply matrices"])
    assert s.shape == (3,)
    assert np.isfinite(s).all()
    # deterministic + batch-size independent
    s2 = rr.score_pairs(["what is a tpu"], ["a tpu is an accelerator"])
    np.testing.assert_allclose(s[0], s2[0], atol=1e-5)
    assert rr.score_pairs([], []).shape == (0,)


def test_cross_encoder_mismatched_pairs_raise():
    rr = CrossEncoderReranker(config=SMALL)
    with pytest.raises(ValueError):
        rr.score_pairs(["a"], ["b", "c"])
