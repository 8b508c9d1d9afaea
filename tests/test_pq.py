"""PQ product-quantized tier (ops/pq.py) vs exact oracles.

Covers: codebook training / encoding quality, ADC score exactness vs the
LUT-gather definition, Pallas-vs-XLA kernel parity, masking, candidate
recall at refine depth, DenseIndex staged build (bf16 -> codes) with
append/growth after the build, manager hybrid path, checkpoint
round-trip, and IVF/PQ mutual exclusion.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import IndexConfig, PipelineConfig
from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.pq import (

    auto_pq_m,
    pq_decode,
    pq_encode,
    pq_lut,
    pq_scores_pallas,
    pq_scores_xla,
    pq_topk,
    pq_train,
)

# heavy compiles / large corpora: nightly + pre-merge (pytest -m slow)
pytestmark = __import__("pytest").mark.slow


def corpus(rng, n=4000, d=64, noise=0.8):
    centers = rng.standard_normal((32, d)).astype(np.float32)
    pts = centers[rng.integers(0, 32, n)] + \
        noise * rng.standard_normal((n, d)).astype(np.float32)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def test_auto_geometry():
    assert auto_pq_m(384, 4) == 96
    assert auto_pq_m(384, 8) == 48
    assert auto_pq_m(6, 4) == 3  # dsub shrinks until it divides dim


def test_train_encode_reconstruction(rng):
    pts = corpus(rng, 2000)
    pq = pq_train(pts, bits=4, iters=8, train_sample=1024)
    codes = pq_encode(pts, pq)
    assert codes.dtype == np.int8
    assert codes.min() >= 0 and codes.max() < 16
    rec = np.asarray(pq_decode(pq, jnp.asarray(codes[:400])))
    mse = float(np.mean((rec - pts[:400]) ** 2))
    # random codebooks (iter 0 equivalent): assignment to random rows
    rnd = pq_train(pts, bits=4, iters=0, train_sample=1024, seed=3)
    rec0 = np.asarray(pq_decode(rnd, jnp.asarray(pq_encode(pts[:400], rnd))))
    mse0 = float(np.mean((rec0 - pts[:400]) ** 2))
    assert mse < mse0 * 0.8  # Lloyd's iterations actually help


def test_adc_scores_match_lut_gather(rng):
    pts = corpus(rng, 512)
    pq = pq_train(pts, bits=4, iters=6, train_sample=512)
    codes = pq_encode(pts, pq)
    q = pts[:5]
    lut = pq_lut(pq, jnp.asarray(q))
    s = np.asarray(pq_scores_xla(jnp.asarray(codes[:256]), lut))
    lut_np = np.asarray(lut)
    ref = np.stack([
        lut_np[i, np.arange(pq.m), codes[:256]].sum(-1) for i in range(5)
    ])
    np.testing.assert_allclose(s, ref, rtol=2e-2, atol=2e-3)  # bf16 MXU


def test_pallas_kernel_matches_xla(rng):
    pts = corpus(rng, 1024)
    pq = pq_train(pts, bits=4, iters=6, train_sample=512)
    codes = jnp.asarray(pq_encode(pts, pq))
    lut = pq_lut(pq, jnp.asarray(pts[:3]))
    s_pl = np.asarray(pq_scores_pallas(codes, lut))       # interpret on CPU
    s_x = np.asarray(pq_scores_xla(codes, lut))
    np.testing.assert_allclose(s_pl, s_x, rtol=1e-5, atol=1e-5)


def test_pq_topk_mask_and_padding(rng):
    pts = corpus(rng, 300)
    pq = pq_train(pts, bits=4, iters=6, train_sample=300)
    codes = jnp.asarray(pq_encode(pts, pq))
    valid = np.zeros(300, bool)
    valid[:6] = True
    s, i = pq_topk(pq.codebooks, codes, jnp.asarray(pts[:2]), 10,
                   jnp.asarray(valid), m=pq.m, bits=4, impl="xla")
    i = np.asarray(i)
    assert set(i[i >= 0].tolist()) <= set(range(6))
    assert np.all(i[:, 6:] == -1)


def test_pq_candidate_recall_at_depth(rng):
    """The tier's operating point: deep candidates + exact refine.
    recall@10-in-candidates at depth 32x must clear 0.9 on a corpus with
    realistic cluster looseness."""
    pts = corpus(rng, 8000)
    pq = pq_train(pts, bits=4, iters=10, train_sample=4096)
    codes = jnp.asarray(pq_encode(pts, pq))
    q = pts[rng.integers(0, 8000, 8)]
    _, oracle = dense_topk(jnp.asarray(pts), jnp.asarray(q), 10,
                           metric="ip", normalize_queries=False)
    _, cand = pq_topk(pq.codebooks, codes, jnp.asarray(q), 320,
                      m=pq.m, bits=4, impl="xla")
    recs = [
        len(set(c[c >= 0].tolist()) & set(o.tolist())) / 10
        for c, o in zip(np.asarray(cand), np.asarray(oracle))
    ]
    assert np.mean(recs) >= 0.9


def test_dense_index_pq_staged_build(rng):
    from advanced_rag_tpu.index.dense_index import DenseIndex

    cfg = IndexConfig(dim=64, dtype="pq", min_capacity=256)
    idx = DenseIndex(cfg)
    assert idx.emb.dtype == jnp.bfloat16  # staging tier pre-build
    pts = corpus(rng, 200)
    idx.append(0, pts)
    idx.build_pq()
    assert idx.has_pq and idx.emb.dtype == jnp.int8
    assert idx.emb.shape[1] == idx._pq.m

    # append AFTER the build encodes with the fixed codebooks and
    # triggers capacity growth (re-encode of the prefix)
    more = corpus(rng, 400)
    idx.append(200, more)
    assert idx.capacity >= 600 and idx.has_pq

    all_pts = np.concatenate([pts, more])
    mask = jnp.asarray(np.arange(idx.capacity) < 600)
    q = all_pts[[3, 450]]
    s, i = idx.search(q, 5, mask)  # auto refine_factor=32 -> exact scores
    i, s = np.asarray(i), np.asarray(s)
    assert i[0, 0] == 3 and i[1, 0] == 450
    assert s[0, 0] == pytest.approx(1.0, abs=1e-4)
    # refined scores are exact f32 dot products of the returned rows
    expect = np.einsum("qd,qkd->qk", q, all_pts[i])
    np.testing.assert_allclose(s, expect, rtol=1e-5, atol=1e-5)


def test_pq_tier_dispatch(rng):
    """In PQ mode build_ivf builds the residual IVF-PQ structure
    (ops/ivfpq.py); build_pq on a float-tier index is rejected."""
    from advanced_rag_tpu.index.dense_index import DenseIndex

    idx = DenseIndex(IndexConfig(dim=32, dtype="pq", min_capacity=64))
    idx.append(0, corpus(rng, 64, d=32))
    idx.build_pq()
    idx.build_ivf(nlist=8)      # -> IVF-PQ, coexists with flat codes
    assert idx.has_pq and idx.has_ivfpq and not idx.has_ivf
    s, i = idx.search(idx._host[:2], 3)
    assert np.asarray(i)[0, 0] == 0  # self-query hits itself
    idx2 = DenseIndex(IndexConfig(dim=32, min_capacity=64))
    idx2.append(0, corpus(rng, 64, d=32))
    idx2.build_ivf(nlist=8)
    assert idx2.has_ivf and not idx2.has_ivfpq
    with pytest.raises(ValueError):
        idx2.build_pq()


def test_manager_pq_hybrid(rng):
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager

    cfg = PipelineConfig(semantic_dtype="pq")
    mgr = MultiIndexManager(config=cfg)
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 3}",
                    content=f"document {j} about topic {j % 5} tpu kernels")
        for j in range(40)
    ]
    assert mgr.index_chunks(chunks)["indexed"] == 40
    mgr.semantic.build_pq()
    stats = mgr.get_collection_stats()
    sem = mgr.semantic  # codes are ~8x smaller than the bf16 tier
    assert stats["semantic"]["memory_bytes"] < sem.capacity * sem.dim * 2 / 4
    hits = mgr.hybrid_search_batch_sync(["document 7 about topic 2"], 5)[0]
    assert hits
    assert "c7" in [h["chunk_id"] for h in hits][:3]
    # pure dense path refines to exact scores -> self text ranks first
    dense_hits = mgr.search_sync("semantic", "document 7 about topic 2", 3)
    assert dense_hits[0]["chunk_id"] == "c7"


def test_checkpoint_pq_roundtrip(rng, tmp_path):
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils.checkpoint import load_index, save_index

    cfg = PipelineConfig(semantic_dtype="pq")
    mgr = MultiIndexManager(config=cfg)
    chunks = [ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                          content=f"chunk {j} text about {j % 7}")
              for j in range(32)]
    mgr.index_chunks(chunks)
    mgr.semantic.build_pq()
    before = mgr.search_sync("semantic", "chunk 9 text about 2", 3)
    save_index(mgr, tmp_path / "ckpt")

    fresh = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    load_index(fresh, tmp_path / "ckpt")
    assert fresh.semantic.has_pq
    # device storage must be the CODES, not a float re-upload (a broken
    # restore chain once overwrote codes with the bf16 mirror and was
    # masked at toy scale by refinement covering the whole corpus)
    assert fresh.semantic.emb.dtype == jnp.int8
    assert fresh.semantic.emb.shape[1] == fresh.semantic._pq.m
    after = fresh.search_sync("semantic", "chunk 9 text about 2", 3)
    assert [h["chunk_id"] for h in after] == [h["chunk_id"] for h in before]
    np.testing.assert_allclose([h["score"] for h in after],
                               [h["score"] for h in before], rtol=1e-5)


def test_hybrid_pq_refined_matches_bf16(rng):
    """BACKLOG #2: the PQ-tier hybrid path over-retrieves deep raw-PQ
    dense candidates in the fused dispatch, exactly re-scores them from
    the f32 mirror, and re-fuses host-side — final hybrid ids must match
    the bf16 tier's (whose dense ranks are exact by construction)."""
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager

    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 5}",
                    content=" ".join(f"w{(j * 13 + t) % 211}"
                                     for t in range(24)))
        for j in range(300)
    ]
    queries = ["w7 w20 w33", "w100 w113", "w1 w14 w27 w40"]

    mref = MultiIndexManager(config=PipelineConfig(semantic_dtype="bfloat16"))
    mref.index_chunks(chunks)
    mpq = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    mpq.index_chunks(chunks)
    mpq.semantic.build_pq()
    assert mpq.semantic.has_pq

    for query in queries:
        ref = [h["chunk_id"] for h in mref.hybrid_search_sync(query, 8)]
        got = [h["chunk_id"] for h in mpq.hybrid_search_sync(query, 8)]
        # the bf16 reference itself carries bf16 rounding in its dense
        # ranks, so require top-3 identity + strong set overlap rather
        # than full positional equality
        assert got[:3] == ref[:3], query
        assert len(set(got) & set(ref)) >= 6, (query, got, ref)


def test_hybrid_pq_refine_disabled_still_works(rng):
    """refine_factor=1 turns host re-fusion off; raw-PQ ranks feed RRF
    in-program (the pre-refinement behavior stays available)."""
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager

    cfg = PipelineConfig(semantic_dtype="pq", semantic_refine=1)
    mgr = MultiIndexManager(config=cfg)
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                    content=f"term{j} filler text number {j}")
        for j in range(64)
    ]
    mgr.index_chunks(chunks)
    mgr.semantic.build_pq()
    hits = mgr.hybrid_search_sync("term3 filler", 5)
    assert hits and all(h["chunk_id"].startswith("c") for h in hits)


def test_opq_beats_flat_on_anisotropic(rng):
    """OPQ rotation must cut reconstruction error and lift candidate
    recall on correlated/anisotropic embeddings (ops/pq.py opq_train)."""
    from advanced_rag_tpu.ops.pq import opq_train

    d = 64
    proj = rng.standard_normal((d, d)).astype(np.float32) * \
        (0.9 ** np.arange(d))[None, :]
    x = rng.standard_normal((4000, d)).astype(np.float32) @ proj
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    flat = pq_train(x, bits=4, train_sample=4000, seed=1)
    rot, opq = opq_train(x, bits=4, train_sample=4000, seed=1,
                         opq_iters=6)
    # rotation is orthogonal
    np.testing.assert_allclose(np.asarray(rot @ rot.T), np.eye(d),
                               atol=1e-4)
    xr = np.asarray(jnp.asarray(x) @ rot)
    e_flat = float(np.mean(
        (np.asarray(pq_decode(flat, jnp.asarray(pq_encode(x, flat))))
         - x) ** 2))
    e_opq = float(np.mean(
        (np.asarray(pq_decode(opq, jnp.asarray(pq_encode(xr, opq))))
         - xr) ** 2))
    assert e_opq < e_flat * 0.85, (e_opq, e_flat)


def test_dense_index_opq_lifecycle(rng, tmp_path):
    """pq_opq=True: build trains a rotation, appends/search/checkpoint
    all stay exact through the rotated code space."""
    from advanced_rag_tpu.index.dense_index import DenseIndex
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils.checkpoint import load_index, save_index

    cfg = IndexConfig(dim=32, dtype="pq", min_capacity=64, pq_opq=True)
    idx = DenseIndex(cfg)
    pts = corpus(rng, 300, d=32)
    idx.append(0, pts)
    idx.build_pq()
    assert idx._pq_rot is not None
    s, i = idx.search(pts[:4], 3)
    assert (np.asarray(i)[:, 0] == np.arange(4)).all()
    # post-build appends encode through the rotation
    more = corpus(rng, 40, d=32)
    idx.append(300, more)
    s2, i2 = idx.search(more[:2], 2)
    assert np.asarray(i2)[0, 0] == 300

    # manager-level: hybrid path rotates the dense query in-program
    mgr = MultiIndexManager(config=PipelineConfig(
        semantic_dtype="pq", semantic_opq=True))
    chunks = [ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                          content=f"text number {j} topic {j % 5}")
              for j in range(48)]
    mgr.index_chunks(chunks)
    mgr.semantic.build_pq()
    assert mgr.semantic._pq_rot is not None
    hits = mgr.hybrid_search_batch_sync(["text number 7 topic 2"], 5)[0]
    assert any(h["chunk_id"] == "c7" for h in hits)

    # checkpoint round-trips the rotation
    save_index(mgr, tmp_path / "ck")
    fresh = MultiIndexManager(config=PipelineConfig(
        semantic_dtype="pq", semantic_opq=True))
    load_index(fresh, tmp_path / "ck")
    assert fresh.semantic._pq_rot is not None
    np.testing.assert_allclose(np.asarray(fresh.semantic._pq_rot),
                               np.asarray(mgr.semantic._pq_rot), rtol=1e-6)
    h2 = fresh.search_sync("semantic", "text number 7 topic 2", 3)
    h1 = mgr.search_sync("semantic", "text number 7 topic 2", 3)
    assert [x["chunk_id"] for x in h1] == [x["chunk_id"] for x in h2]


def test_opq_with_ivfpq_rejected(rng):
    from advanced_rag_tpu.index.dense_index import DenseIndex

    idx = DenseIndex(IndexConfig(dim=32, dtype="pq", min_capacity=64,
                                 pq_opq=True))
    idx.append(0, corpus(rng, 64, d=32))
    idx.build_pq()
    with pytest.raises(ValueError):
        idx.build_ivfpq(nlist=8)
