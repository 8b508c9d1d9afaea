"""SQ8 int8 quantized tier (ops/quant.py) vs f32 oracles.

Covers: quantization error bound, top-k overlap vs exact f32 search,
mask behavior, IVF int8 packing/recall, DenseIndex int8 storage
(append/grow/search), and the fused hybrid program with sq8 dense.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import IndexConfig
from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.quant import (
    dense_topk_sq8,
    sq8_quantize,
    sq8_quantize_host,
)


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_quantize_roundtrip_error_bound(rng):
    x = rng.standard_normal((50, 96)).astype(np.float32)
    codes, scale = sq8_quantize_host(x)
    assert codes.dtype == np.int8
    deq = codes.astype(np.float32) * scale[:, None]
    # symmetric rounding: per-element error <= scale/2
    assert np.all(np.abs(deq - x) <= scale[:, None] / 2 + 1e-7)


def test_device_quantize_matches_host(rng):
    x = rng.standard_normal((20, 64)).astype(np.float32)
    hc, hs = sq8_quantize_host(x)
    dc, ds = sq8_quantize(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ds), hs, rtol=1e-6)
    # round-half cases may differ by 1 code; scores differ negligibly
    assert np.mean(np.asarray(dc) != hc) < 0.01


def test_sq8_topk_overlap_vs_exact(rng):
    emb = normed(rng, 4000, 128)
    q = normed(rng, 6, 128)
    codes, scale = sq8_quantize_host(emb)
    s8, i8 = dense_topk_sq8(jnp.asarray(codes), jnp.asarray(scale),
                            jnp.asarray(q), 10, metric="cosine",
                            block_size=512)
    sf, if_ = dense_topk(jnp.asarray(emb), jnp.asarray(q), 10,
                         metric="cosine")
    for r8, rf in zip(np.asarray(i8), np.asarray(if_)):
        assert len(set(r8.tolist()) & set(rf.tolist())) >= 9
    # dequantized scores track f32 scores closely
    np.testing.assert_allclose(np.asarray(s8), np.asarray(sf),
                               rtol=0.05, atol=0.02)


def test_sq8_topk_respects_mask(rng):
    emb = normed(rng, 200, 32)
    q = normed(rng, 2, 32)
    codes, scale = sq8_quantize_host(emb)
    valid = np.zeros(200, bool)
    valid[:7] = True
    s, i = dense_topk_sq8(jnp.asarray(codes), jnp.asarray(scale),
                          jnp.asarray(q), 10,
                          jnp.asarray(valid), metric="cosine")
    i = np.asarray(i)
    assert set(i[i >= 0].tolist()) <= set(range(7))
    assert np.all(i[:, 7:] == -1)


def test_ivf_int8_recall(rng):
    from advanced_rag_tpu.ops.ivf import build_ivf, ivf_topk

    # clustered corpus so IVF has structure to exploit
    centers = normed(rng, 16, 64) * 4.0
    pts = centers[rng.integers(0, 16, 3000)] + \
        rng.standard_normal((3000, 64)).astype(np.float32) * 0.3
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    parts = build_ivf(pts, nlist=16, dtype="int8", kmeans_iters=8)
    assert parts.packed_emb.dtype == jnp.int8
    assert parts.packed_scale is not None
    q = pts[rng.integers(0, 3000, 5)]
    s, i = ivf_topk(parts, jnp.asarray(q), 10, nprobe=16)  # full probe
    sf, if_ = dense_topk(jnp.asarray(pts), jnp.asarray(q), 10, metric="ip",
                         normalize_queries=False)
    overlaps = [len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(np.asarray(i), np.asarray(if_))]
    assert np.mean(overlaps) >= 9.0  # full-probe int8 ~= exact


def test_dense_index_int8_end_to_end(rng):
    from advanced_rag_tpu.index.dense_index import DenseIndex

    cfg = IndexConfig(dim=48, dtype="int8", min_capacity=64)
    idx = DenseIndex(cfg)
    assert idx.emb.dtype == jnp.int8
    v1 = rng.standard_normal((40, 48)).astype(np.float32)
    idx.append(0, v1)
    # growth path re-quantizes the full prefix
    v2 = rng.standard_normal((100, 48)).astype(np.float32)
    idx.append(40, v2)
    assert idx.capacity >= 140 and idx.emb.dtype == jnp.int8

    all_v = np.concatenate([v1, v2])
    all_n = all_v / np.linalg.norm(all_v, axis=1, keepdims=True)
    q = all_n[3:5]
    mask = jnp.asarray(np.arange(idx.capacity) < 140)
    s, i = idx.search(q, 5, mask)
    i = np.asarray(i)
    # the query rows themselves must rank first
    assert i[0, 0] == 3 and i[1, 0] == 4
    assert float(np.asarray(s)[0, 0]) == pytest.approx(1.0, abs=0.02)


def test_hybrid_retrieve_sq8_path(rng):
    from advanced_rag_tpu.ops.hybrid import hybrid_retrieve

    n, d, p, v = 256, 32, 8, 512
    emb = normed(rng, n, d)
    codes, scale = sq8_quantize_host(emb)
    doc_idx = rng.integers(0, v, (n, p)).astype(np.int32)
    doc_tf = np.ones((n, p), np.float32)
    doc_len = np.full((n,), float(p), np.float32)
    df = np.maximum(np.bincount(doc_idx.reshape(-1), minlength=v), 1)
    q = emb[10:11]
    res = hybrid_retrieve(
        jnp.asarray(codes), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
        jnp.asarray(doc_len), jnp.asarray(df.astype(np.int32)),
        jnp.float32(n), jnp.asarray(q),
        jnp.asarray(doc_idx[10:11, :4]), jnp.ones((1, 4), jnp.float32),
        jnp.asarray(np.ones(n, bool)),
        jnp.asarray([0.7, 0.3], jnp.float32), jnp.float32(0.8),
        emb_scale=jnp.asarray(scale),
        k_cand=16, k_out=8, dense_impl="sq8",
    )
    ids = np.asarray(res.ids)
    assert ids[0, 0] == 10  # exact self-match survives fusion + MMR


def test_manager_int8_semantic(rng):
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.config import PipelineConfig

    from advanced_rag_tpu.index.corpus import ChunkRecord

    cfg = PipelineConfig(semantic_dtype="int8")
    mgr = MultiIndexManager(config=cfg)
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 3}",
                    content=f"document {j} about topic {j % 5} tpu kernels")
        for j in range(30)
    ]
    r = mgr.index_chunks(chunks)
    assert r["indexed"] == 30
    assert mgr.semantic.emb.dtype == jnp.int8
    hits = mgr.hybrid_search_batch_sync(["document 7 about topic 2"], 5)[0]
    assert hits and hits[0]["chunk_id"] == "c7"


def test_sq8_refine_exact_scores(rng):
    """refine_factor > 1: returned scores are EXACT f32 cosines and the
    refined ranking matches the f32 oracle (BACKLOG #2)."""
    from advanced_rag_tpu.index.dense_index import DenseIndex

    cfg = IndexConfig(dim=64, dtype="int8", min_capacity=512,
                      refine_factor=4)
    idx = DenseIndex(cfg)
    v = rng.standard_normal((400, 64)).astype(np.float32)
    idx.append(0, v)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = normed(rng, 3, 64)
    mask = jnp.asarray(np.arange(idx.capacity) < 400)
    s, i = idx.search(q, 10, mask)
    got, rows = np.asarray(s), np.asarray(i)
    expect = np.einsum("qd,qkd->qk", q, vn[rows])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
    sf, if_ = dense_topk(jnp.asarray(vn), jnp.asarray(q), 10,
                         metric="cosine")
    for a, b in zip(rows, np.asarray(if_)):
        assert len(set(a.tolist()) & set(b.tolist())) >= 9


def test_sq8_refine_mask_and_padding(rng):
    from advanced_rag_tpu.index.dense_index import DenseIndex

    cfg = IndexConfig(dim=32, dtype="int8", min_capacity=64,
                      refine_factor=3)
    idx = DenseIndex(cfg)
    idx.append(0, rng.standard_normal((50, 32)).astype(np.float32))
    valid = np.zeros(idx.capacity, bool)
    valid[:4] = True
    s, i = idx.search(normed(rng, 2, 32), 10, jnp.asarray(valid))
    i = np.asarray(i)
    assert set(i[i >= 0].tolist()) <= set(range(4))
    assert np.all(i[:, 4:] == -1)


def test_sq8_approx_matches_scan(rng):
    from advanced_rag_tpu.ops.quant import dense_topk_sq8_approx

    emb = normed(rng, 3000, 64)
    q = normed(rng, 4, 64)
    codes, scale = sq8_quantize_host(emb)
    c, s = jnp.asarray(codes), jnp.asarray(scale)
    valid = np.ones(3000, bool)
    valid[100:200] = False
    s1, i1 = dense_topk_sq8(c, s, jnp.asarray(q), 10, jnp.asarray(valid),
                            metric="cosine")
    s2, i2 = dense_topk_sq8_approx(c, s, jnp.asarray(q), 10,
                                   jnp.asarray(valid), metric="cosine")
    for a, b in zip(np.asarray(i1), np.asarray(i2)):
        assert len(set(a.tolist()) & set(b.tolist())) >= 9
    i2 = np.asarray(i2)
    assert not np.isin(i2, np.arange(100, 200)).any()  # mask respected
