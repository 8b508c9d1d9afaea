"""parallel/sharded_e2e.py on the virtual 8-device mesh.

The pod-scale one-dispatch retrieve+rerank must agree with the
single-device program (ops/e2e.py) on the same corpus: identical
candidates from the sharded hybrid + identical cross-encoder ranking
from the data-parallel pair scoring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advanced_rag_tpu.config import MeshConfig
from advanced_rag_tpu.models.encoder import (
    EncoderConfig,
    init_bi_encoder,
    init_cross_encoder,
)
from advanced_rag_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig
from advanced_rag_tpu.ops import make_retrieve_rerank
from advanced_rag_tpu.parallel import (
    build_mesh,
    make_sharded_retrieve_rerank,
    pad_to_shards,
    shard_corpus_arrays,
    sharded_token_gather,
)

CFG = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=1,
                    num_heads=4, mlp_dim=64, max_len=64)
TOK = HashingTokenizer(TokenizerConfig(vocab_size=1024, max_len=16))
N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    mesh = build_mesh(MeshConfig(mesh_shape=(N_DEV, 1)))
    bi, p_bi = init_bi_encoder(CFG, out_dim=16, seed=0)
    ce, p_ce = init_cross_encoder(CFG, seed=1)
    rng = np.random.default_rng(0)
    n, vocab, nnz = 64, 512, 8
    texts = [f"document number {i} about topic {i % 7}" for i in range(n)]
    tok_ids, _ = TOK.encode_batch(texts)
    emb = np.asarray(
        bi.apply(p_bi, jnp.asarray(tok_ids),
                 jnp.asarray((tok_ids != 0).astype(np.float32))))
    doc_idx = rng.integers(4, vocab, (n, nnz)).astype(np.int32)
    doc_tf = np.ones((n, nnz), np.float32)
    doc_len = np.full((n,), float(nnz), np.float32)
    df = np.ones((vocab,), np.int32)
    valid = np.ones((n,), bool)
    sharded = shard_corpus_arrays(
        mesh,
        pad_to_shards(emb.astype(np.float32), N_DEV),
        pad_to_shards(tok_ids.astype(np.int32), N_DEV),
        pad_to_shards(doc_idx, N_DEV, -1),
        pad_to_shards(doc_tf, N_DEV),
        pad_to_shards(doc_len, N_DEV),
        pad_to_shards(valid, N_DEV),
    )
    return dict(mesh=mesh, bi=bi, p_bi=p_bi, ce=ce, p_ce=p_ce,
                n=n, vocab=vocab, texts=texts,
                emb=emb, tok_ids=tok_ids, doc_idx=doc_idx,
                doc_tf=doc_tf, doc_len=doc_len, df=df, valid=valid,
                sharded=sharded)


def _queries(s, texts):
    q_ids, q_mask = TOK.encode_batch(texts)
    rng = np.random.default_rng(3)
    q_idx = rng.integers(4, s["vocab"], (len(texts), 4)).astype(np.int32)
    q_tf = np.ones((len(texts), 4), np.float32)
    return (jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(q_idx), jnp.asarray(q_tf))


def test_token_gather_matches_local(setup):
    s = setup
    _, tok_s, *_ = s["sharded"]
    cand = jnp.asarray([[0, 5, 63, -1], [17, 17, 2, 40]], jnp.int32)
    got = np.asarray(sharded_token_gather(tok_s, cand, mesh=s["mesh"]))
    want = np.where(np.asarray(cand)[..., None] >= 0,
                    s["tok_ids"][np.clip(np.asarray(cand), 0, None)], 0)
    np.testing.assert_array_equal(got, want)


def test_sharded_matches_single_device(setup):
    s = setup
    emb_s, tok_s, di_s, dt_s, dl_s, v_s = s["sharded"]
    weights = jnp.asarray([0.7, 0.3], jnp.float32)
    kw = dict(k_cand=16, k_out=16, k_rerank=8, k_final=4,
              dense_impl="scan", use_mmr=False)
    sharded_prog = make_sharded_retrieve_rerank(
        s["bi"], s["ce"], mesh=s["mesh"], **kw)
    single_prog = make_retrieve_rerank(s["bi"], s["ce"], **kw)

    args = _queries(s, ["document number three", "topic five material"])
    res_s = sharded_prog(
        s["p_bi"], s["p_ce"], *args, tok_s, emb_s, di_s, dt_s, dl_s,
        jnp.asarray(s["df"]), jnp.float32(s["n"]), v_s, weights,
        jnp.float32(0.8))
    res_1 = single_prog(
        s["p_bi"], s["p_ce"], *args,
        jnp.asarray(s["tok_ids"].astype(np.int32)),
        jnp.asarray(s["emb"], jnp.float32),
        jnp.asarray(s["doc_idx"]), jnp.asarray(s["doc_tf"]),
        jnp.asarray(s["doc_len"]), jnp.asarray(s["df"]),
        jnp.float32(s["n"]), jnp.asarray(s["valid"]), weights,
        jnp.float32(0.8))

    np.testing.assert_array_equal(np.asarray(res_s.ids),
                                  np.asarray(res_1.ids))
    np.testing.assert_allclose(np.asarray(res_s.ce_scores),
                               np.asarray(res_1.ce_scores),
                               rtol=1e-4, atol=1e-4)


def test_sq8_tier(setup):
    s = setup
    from advanced_rag_tpu.ops.quant import sq8_quantize_host

    codes, scale = sq8_quantize_host(s["emb"].astype(np.float32))
    mesh = s["mesh"]
    codes_s, scale_s, tok_s, di_s, dt_s, dl_s, v_s = shard_corpus_arrays(
        mesh,
        pad_to_shards(codes, N_DEV),
        pad_to_shards(scale, N_DEV),
        pad_to_shards(s["tok_ids"].astype(np.int32), N_DEV),
        pad_to_shards(s["doc_idx"], N_DEV, -1),
        pad_to_shards(s["doc_tf"], N_DEV),
        pad_to_shards(s["doc_len"], N_DEV),
        pad_to_shards(s["valid"], N_DEV),
    )
    prog = make_sharded_retrieve_rerank(
        s["bi"], s["ce"], mesh=mesh, k_cand=16, k_out=16, k_rerank=8,
        k_final=4, dense_impl="sq8", use_mmr=False)
    args = _queries(s, ["document number three"])
    res = prog(s["p_bi"], s["p_ce"], *args, tok_s, codes_s, di_s, dt_s,
               dl_s, jnp.asarray(s["df"]), jnp.float32(s["n"]), v_s,
               jnp.asarray([0.7, 0.3], jnp.float32), jnp.float32(0.8),
               emb_scale=scale_s)
    ids = np.asarray(res.ids)[0]
    assert (ids[ids >= 0] < s["n"]).all()
    assert (ids >= 0).sum() >= 1
