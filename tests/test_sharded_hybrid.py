"""Sharded fused hybrid == single-device fused hybrid, on the CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import MeshConfig
from advanced_rag_tpu.index.text import encode_documents, encode_queries
from advanced_rag_tpu.ops.hybrid import hybrid_retrieve
from advanced_rag_tpu.parallel import build_mesh, pad_to_shards, shard_corpus_arrays
from advanced_rag_tpu.parallel.sharded_hybrid import sharded_hybrid_retrieve


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, d, vocab, nnz = 512, 32, 2048, 24
    texts = [
        f"doc {i} " + " ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "fox", "query"], 8).tolist())
        for i in range(n)
    ]
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, vocab, nnz)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((2, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_idx, q_tf = encode_queries(["alpha fox", "gamma delta query"], vocab, 16)
    valid = np.ones(n, bool)
    valid[7] = False
    return emb, doc_idx, doc_tf, doc_len, df, q, q_idx, q_tf, valid, n


@pytest.mark.parametrize("use_mmr", [False, True])
def test_matches_single_device(setup, use_mmr):
    emb, doc_idx, doc_tf, doc_len, df, q, q_idx, q_tf, valid, n = setup
    w = jnp.asarray([0.7, 0.3], jnp.float32)
    lam = jnp.float32(0.8)

    ref = hybrid_retrieve(
        jnp.asarray(emb), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
        jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        jnp.asarray(valid), w, lam,
        k_cand=24, k_out=8, use_mmr=use_mmr,
    )

    mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
    arrs = shard_corpus_arrays(
        mesh, pad_to_shards(emb, 8), pad_to_shards(doc_idx, 8, -1),
        pad_to_shards(doc_tf, 8), pad_to_shards(doc_len, 8),
        pad_to_shards(valid, 8, False),
    )
    emb_s, di_s, dt_s, dl_s, v_s = arrs
    got_i, got_s, got_c = sharded_hybrid_retrieve(
        emb_s, di_s, dt_s, dl_s, jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        v_s, w, lam, mesh=mesh, k_cand=24, k_out=8, use_mmr=use_mmr,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_c),
                                  np.asarray(ref.method_counts))
    assert 7 not in np.asarray(got_i)  # masked row never surfaces


@pytest.mark.parametrize("use_mmr", [False, True])
def test_pq_rung_matches_single_device(setup, use_mmr):
    """Row-sharded flat-PQ codes + replicated codebooks reproduce the
    single-chip PQ hybrid exactly (same codes, same ADC, ICI merge)."""
    from advanced_rag_tpu.ops.pq import pq_encode, pq_train

    emb, doc_idx, doc_tf, doc_len, df, q, q_idx, q_tf, valid, n = setup
    w = jnp.asarray([0.7, 0.3], jnp.float32)
    lam = jnp.float32(0.8)
    pq = pq_train(emb, bits=4, train_sample=512, seed=2)
    codes = pq_encode(emb, pq)

    ref = hybrid_retrieve(
        jnp.asarray(codes), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
        jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        jnp.asarray(valid), w, lam, pq_codebooks=pq.codebooks,
        k_cand=24, k_out=8, use_mmr=use_mmr,
        dense_impl="pq", pq_m=pq.m, pq_bits=4, pq_impl="xla",
        dense_depth=96,
    )

    mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
    arrs = shard_corpus_arrays(
        mesh, pad_to_shards(codes, 8), pad_to_shards(doc_idx, 8, -1),
        pad_to_shards(doc_tf, 8), pad_to_shards(doc_len, 8),
        pad_to_shards(valid, 8, False),
    )
    emb_s, di_s, dt_s, dl_s, v_s = arrs
    got_i, got_s, got_c, gd_i, gd_s = sharded_hybrid_retrieve(
        emb_s, di_s, dt_s, dl_s, jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        v_s, w, lam, pq.codebooks, mesh=mesh, k_cand=24, k_out=8,
        use_mmr=use_mmr, dense_impl="pq", pq_m=pq.m, pq_bits=4,
        pq_impl="xla", dense_depth=96,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-6)
    # deep dense candidate SETS match (tie order may differ across the
    # shard merge; ADC scores of distinct rows can be bit-equal)
    assert gd_i.shape == (2, 96)
    for r in range(2):
        ref_set = set(np.asarray(ref.dense_ids)[r].tolist()) - {-1}
        got_set = set(np.asarray(gd_i)[r].tolist()) - {-1}
        assert len(got_set & ref_set) >= int(0.9 * len(ref_set))


def test_sq8_rung_matches_single_device(setup):
    """Row-sharded SQ8 codes + per-row scales reproduce the single-chip
    SQ8 hybrid (int8 MXU matmul + rescale per shard, ICI merge)."""
    from advanced_rag_tpu.ops.quant import sq8_quantize_host

    emb, doc_idx, doc_tf, doc_len, df, q, q_idx, q_tf, valid, n = setup
    w = jnp.asarray([0.7, 0.3], jnp.float32)
    lam = jnp.float32(0.8)
    codes, scale = sq8_quantize_host(emb)

    ref = hybrid_retrieve(
        jnp.asarray(codes), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
        jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        jnp.asarray(valid), w, lam, emb_scale=jnp.asarray(scale),
        k_cand=24, k_out=8, use_mmr=True, dense_impl="sq8",
    )

    mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
    arrs = shard_corpus_arrays(
        mesh, pad_to_shards(codes, 8), pad_to_shards(doc_idx, 8, -1),
        pad_to_shards(doc_tf, 8), pad_to_shards(doc_len, 8),
        pad_to_shards(valid, 8, False), pad_to_shards(scale, 8),
    )
    emb_s, di_s, dt_s, dl_s, v_s, sc_s = arrs
    got_i, got_s, got_c = sharded_hybrid_retrieve(
        emb_s, di_s, dt_s, dl_s, jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        v_s, w, lam, None, sc_s, mesh=mesh, k_cand=24, k_out=8,
        use_mmr=True, dense_impl="sq8",
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-6)
