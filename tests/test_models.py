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


# ---- cross-segment lexical-match channel (encoder.py) -------------------

def test_cross_segment_match_indicator():
    import jax.numpy as jnp

    from advanced_rag_tpu.models.encoder import cross_segment_match

    # seq: [CLS]=1  q:(10, 11)  [SEP]=2 | d:(11, 12)  [SEP]=2, pad=0
    ids = jnp.asarray([[1, 10, 11, 2, 11, 12, 2, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0]], jnp.float32)
    segs = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]])
    m = np.asarray(cross_segment_match(ids, mask, segs, num_reserved=8))
    # 11 occurs on both sides -> both its slots match; 10 and 12 do not;
    # special ids (1, 2) and the masked pad slot never match
    assert m.tolist() == [[0, 0, 1, 0, 1, 0, 0, 0]]


def test_cross_encoder_lexical_match_channel():
    """lexical_match=True: params gain match_embed, forward runs, and
    the score responds to query-doc token overlap."""
    from advanced_rag_tpu.models.encoder import init_cross_encoder
    from advanced_rag_tpu.models.tokenizer import (HashingTokenizer,
                                                   TokenizerConfig)

    cfg = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=32,
                        lexical_match=True)
    model, params = init_cross_encoder(cfg, seed=0)
    assert "match_embed" in params["params"]
    tok = HashingTokenizer(TokenizerConfig(vocab_size=1024, max_len=32))
    ids, mask, segs = tok.encode_pairs_static(
        ["alpha beta", "alpha beta"],
        ["alpha beta gamma", "delta epsilon zeta"], 8, 12)
    s = np.asarray(model.apply(params, ids, mask, segs))
    assert s.shape == (2,) and np.isfinite(s).all()
    # overlapping pair and disjoint pair see different match planes, so
    # even an untrained model must produce different scores
    assert abs(s[0] - s[1]) > 1e-6


def test_reranker_ckpt_roundtrips_lexical_match(tmp_path):
    from advanced_rag_tpu.models.encoder import init_cross_encoder
    from advanced_rag_tpu.train import load_reranker, save_reranker

    cfg = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=32,
                        lexical_match=True)
    _, params = init_cross_encoder(cfg, seed=0)
    save_reranker(params, cfg, tmp_path / "ck", q_len=8, d_len=12)
    cfg2, _, layout = load_reranker(tmp_path / "ck")
    assert cfg2.lexical_match is True
    assert layout == {"q_len": 8, "d_len": 12}


def test_biencoder_lexical_pool_channel():
    """lexical_pool: hashed-BoW channel makes exact-term-sharing pairs
    closer than disjoint pairs even UNTRAINED (random projection of
    sqrt-tf bags approximately preserves lexical dot products), and the
    params carry the lex_proj/lex_scale leaves for checkpoint serde."""
    import jax.numpy as jnp
    import numpy as np

    from advanced_rag_tpu.models.encoder import EncoderConfig, init_bi_encoder
    from advanced_rag_tpu.models.tokenizer import (
        HashingTokenizer, TokenizerConfig)

    cfg = EncoderConfig(vocab_size=2048, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=32,
                        lexical_pool=True)
    model, params = init_bi_encoder(cfg, out_dim=64, seed=0)
    leaves = params["params"]
    assert "lex_proj" in leaves and "lex_scale" in leaves
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    texts = ["zanzibar quorum flotilla gossamer ratchet",
             "zanzibar quorum flotilla gossamer pinion",
             "completely different words about nothing shared"]
    ids, mask = tok.encode_batch(texts)
    emb = np.asarray(model.apply(params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               atol=1e-4)
    overlap = float(emb[0] @ emb[1])
    disjoint = float(emb[0] @ emb[2])
    assert overlap > disjoint


def test_biencoder_ckpt_roundtrips_lexical_pool(tmp_path):
    from advanced_rag_tpu.models.encoder import EncoderConfig, init_bi_encoder
    from advanced_rag_tpu.train.loop import load_biencoder, save_biencoder

    cfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=16,
                        lexical_pool=True)
    _, params = init_bi_encoder(cfg, out_dim=16, seed=1)
    save_biencoder(params, cfg, 16, tmp_path / "ck")
    got_cfg, out_dim, got = load_biencoder(tmp_path / "ck")
    assert got_cfg.lexical_pool is True
    assert out_dim == 16
    assert "lex_proj" in got["params"]
