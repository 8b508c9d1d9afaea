"""Sharded partitioned ANN (parallel/sharded_ivf.py) on the CPU mesh:
per-shard IVF / IVF-PQ structures match single-chip behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import MeshConfig
from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.parallel import (
    build_mesh,
    build_sharded_ivf,
    build_sharded_ivfpq,
    pad_to_shards,
    shard_corpus_arrays,
    sharded_ivf_topk,
    sharded_ivfpq_topk,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, d = 2048, 32
    centers = rng.standard_normal((64, d)).astype(np.float32)
    emb = centers[rng.integers(0, 64, n)] + \
        0.1 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, 4)] + \
        0.03 * rng.standard_normal((4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
    valid = np.ones(n, bool)
    valid[5] = False
    v_s = shard_corpus_arrays(mesh, pad_to_shards(valid, 8, False))
    _, oracle = dense_topk(jnp.asarray(emb), jnp.asarray(q), 10,
                           jnp.asarray(valid), metric="ip")
    return emb, q, mesh, v_s, np.asarray(oracle)


def recall(got, want):
    got = np.asarray(got)
    return np.mean([
        len(set(got[i][got[i] >= 0]) & set(want[i])) / want.shape[1]
        for i in range(len(want))
    ])


def test_sharded_ivf_full_probe_recall(setup):
    emb, q, mesh, v_s, oracle = setup
    parts = build_sharded_ivf(emb, mesh, nlist=16, train_sample=2048)
    s, i = sharded_ivf_topk(parts, jnp.asarray(q), 10, v_s,
                            mesh=mesh, nprobe=16)
    assert recall(i, oracle) >= 0.95   # full probe: near-exact
    assert 5 not in np.asarray(i)      # masked row never surfaces
    # global ids are in range and unique per query
    ia = np.asarray(i)
    for r in ia:
        live = r[r >= 0]
        assert len(set(live.tolist())) == len(live)
        assert (live < len(emb)).all()


def test_sharded_ivf_sq8(setup):
    emb, q, mesh, v_s, oracle = setup
    parts = build_sharded_ivf(emb, mesh, nlist=16, dtype="int8",
                              train_sample=2048)
    s, i = sharded_ivf_topk(parts, jnp.asarray(q), 10, v_s,
                            mesh=mesh, nprobe=16)
    assert recall(i, oracle) >= 0.9


def test_sharded_ivfpq_candidate_recall(setup):
    emb, q, mesh, v_s, oracle = setup
    idx = build_sharded_ivfpq(emb, mesh, nlist=16, train_sample=2048)
    m = int(idx.codebooks.shape[1])    # stacked: [S, m, c, dsub]
    s, i = sharded_ivfpq_topk(idx, jnp.asarray(q), 40, v_s,
                              mesh=mesh, nprobe=16, m=m, bits=4)
    assert recall(i, oracle) >= 0.9    # exact top-10 inside depth-40
    assert 5 not in np.asarray(i)


def test_sharded_fused_hybrid_ivfpq(setup):
    """IVF-PQ inside the sharded fused program: partitioned candidate
    generation + BM25 + RRF + MMR in one dispatch; deep candidates
    surface for host refinement."""
    from advanced_rag_tpu.index.text import encode_documents, encode_queries
    from advanced_rag_tpu.ops.pq import pq_encode, pq_train
    from advanced_rag_tpu.parallel import sharded_hybrid_retrieve

    emb, q, mesh, v_s, oracle = setup
    rng = np.random.default_rng(1)
    n = len(emb)
    texts = [f"doc {i} " + " ".join(rng.choice(
        ["alpha", "beta", "gamma", "delta"], 6).tolist()) for i in range(n)]
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, 2048, 16)
    q_idx, q_tf = encode_queries(["alpha beta", "gamma delta",
                                  "alpha", "delta beta"], 2048, 8)

    sidx = build_sharded_ivfpq(emb, mesh, nlist=16, train_sample=2048)
    flat = pq_train(emb, bits=4, train_sample=2048, seed=3)
    codes = pq_encode(emb, flat)

    arrs = shard_corpus_arrays(
        mesh, pad_to_shards(codes, 8), pad_to_shards(doc_idx, 8, -1),
        pad_to_shards(doc_tf, 8), pad_to_shards(doc_len, 8),
    )
    emb_s, di_s, dt_s, dl_s = arrs
    out = sharded_hybrid_retrieve(
        emb_s, di_s, dt_s, dl_s, jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        v_s, jnp.asarray([0.7, 0.3], jnp.float32), jnp.float32(0.8),
        flat.codebooks, None, sidx,
        mesh=mesh, k_cand=16, k_out=8, use_mmr=True,
        dense_impl="ivfpq", nprobe=16, pq_m=flat.m, pq_bits=4,
        dense_depth=64,
    )
    ids, scores, counts, d_ids, d_s = out
    assert (np.asarray(ids) >= 0).any()
    assert d_ids.shape == (4, 64)
    # deep partitioned candidates cover the exact top-10 (full probe)
    assert recall(d_ids, oracle) >= 0.9
    assert 5 not in np.asarray(ids)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_sharded_fused_hybrid_ivf(setup, dtype):
    """Float and SQ8 IVF partitions inside the sharded fused program."""
    from advanced_rag_tpu.index.text import encode_documents, encode_queries
    from advanced_rag_tpu.ops.quant import sq8_quantize_host
    from advanced_rag_tpu.parallel import sharded_hybrid_retrieve

    emb, q, mesh, v_s, oracle = setup
    rng = np.random.default_rng(2)
    n = len(emb)
    texts = [f"doc {i} " + " ".join(rng.choice(
        ["alpha", "beta", "gamma", "delta"], 6).tolist()) for i in range(n)]
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, 2048, 16)
    q_idx, q_tf = encode_queries(["alpha beta", "gamma delta",
                                  "alpha", "delta beta"], 2048, 8)
    parts = build_sharded_ivf(emb, mesh, nlist=16, dtype=dtype,
                              train_sample=2048)
    if dtype == "int8":
        codes, scale = sq8_quantize_host(emb)
        emb_rows, scale_rows = codes, scale
    else:
        emb_rows, scale_rows = emb, None
    arrs = shard_corpus_arrays(
        mesh, pad_to_shards(emb_rows, 8), pad_to_shards(doc_idx, 8, -1),
        pad_to_shards(doc_tf, 8), pad_to_shards(doc_len, 8),
    )
    emb_s, di_s, dt_s, dl_s = arrs
    sc_s = (shard_corpus_arrays(mesh, pad_to_shards(scale_rows, 8))
            if scale_rows is not None else None)
    out = sharded_hybrid_retrieve(
        emb_s, di_s, dt_s, dl_s, jnp.asarray(df), jnp.float32(n),
        jnp.asarray(q), jnp.asarray(q_idx), jnp.asarray(q_tf),
        v_s, jnp.asarray([0.7, 0.3], jnp.float32), jnp.float32(0.8),
        None, sc_s, None, parts,
        mesh=mesh, k_cand=16, k_out=8, use_mmr=True,
        dense_impl="ivf", nprobe=16, dense_depth=40,
    )
    ids, scores, counts, d_ids, d_s = out
    assert (np.asarray(ids) >= 0).any()
    assert recall(d_ids, oracle) >= (0.85 if dtype == "int8" else 0.9)
    assert 5 not in np.asarray(ids)
