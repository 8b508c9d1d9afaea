"""IVF-PQ residual tier (ops/ivfpq.py) vs exact oracles.

Covers: build/search recall on a clustered corpus, the residual-vs-flat
recall win (the reason this tier exists — BACKLOG capability #5),
streaming tail appends (assign+encode on device, pow2 growth), validity
masking, score decomposition exactness, and tiny-corpus edges.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.ivfpq import (
    build_ivfpq,
    ivfpq_append_tail,
    ivfpq_topk,
)
from advanced_rag_tpu.ops.pq import pq_encode, pq_topk, pq_train

# heavy compiles / large corpora: nightly + pre-merge (pytest -m slow)
pytestmark = __import__("pytest").mark.slow


def clustered(rng, n=6000, d=64, n_clusters=512, noise=0.05):
    """Many tight clusters (more clusters than one 16-entry codebook can
    span, noise norm ~0.4 vs unit centers) — the regime where flat PQ
    starves and residual encoding shines."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, n_clusters, n)] + \
        noise * rng.standard_normal((n, d)).astype(np.float32)
    return (pts / np.linalg.norm(pts, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    pts = clustered(rng)
    q = pts[rng.integers(0, len(pts), 8)] + \
        0.05 * rng.standard_normal((8, pts.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = build_ivfpq(pts, nlist=128, train_sample=6000, seed=1)
    return pts, q, idx


def recall(got, want, k):
    got, want = np.asarray(got), np.asarray(want)
    return np.mean([
        len(set(got[i][got[i] >= 0]) & set(want[i])) / k
        for i in range(len(want))
    ])


def test_full_probe_candidate_recall(built):
    """nprobe == nlist: only PQ quantization error remains.  The tier's
    contract is candidate GENERATION (exact refinement re-ranks
    downstream), so measure exact-top-10 coverage at refine depth 4x."""
    pts, q, idx = built
    es, ei = dense_topk(jnp.asarray(pts), jnp.asarray(q), 10, metric="ip")
    s, i = ivfpq_topk(idx, jnp.asarray(q), 40, nprobe=128, m=16, bits=4)
    assert recall(i, np.asarray(ei), 10) >= 0.95


def test_residual_beats_flat_pq(built):
    """The headline: residual codes must beat flat PQ codes at equal
    geometry on a clustered corpus (this is why IVF-PQ exists)."""
    pts, q, idx = built
    _, ei = dense_topk(jnp.asarray(pts), jnp.asarray(q), 10, metric="ip")
    flat = pq_train(pts, bits=4, train_sample=4096, seed=1)
    fcodes = pq_encode(pts, flat)
    _, fi = pq_topk(flat.codebooks, jnp.asarray(fcodes), jnp.asarray(q),
                    10, m=flat.m, bits=4, impl="xla")
    _, ri = ivfpq_topk(idx, jnp.asarray(q), 10, nprobe=128, m=16, bits=4)
    r_flat = recall(fi, np.asarray(ei), 10)
    r_res = recall(ri, np.asarray(ei), 10)
    # the lift is corpus-dependent; require a strict win plus a strong
    # absolute bar (flat PQ measures ~0.81 / residual ~0.86 at depth 10
    # on this corpus; both ~1.0 at depth 40, hence depth-10 comparison)
    assert r_res > r_flat, (r_res, r_flat)
    assert r_res >= 0.85, r_res


def test_nprobe_bounds_work(built):
    pts, q, idx = built
    _, ei = dense_topk(jnp.asarray(pts), jnp.asarray(q), 10, metric="ip")
    r_small = recall(
        ivfpq_topk(idx, jnp.asarray(q), 10, nprobe=4, m=16, bits=4)[1],
        np.asarray(ei), 10)
    r_full = recall(
        ivfpq_topk(idx, jnp.asarray(q), 10, nprobe=128, m=16, bits=4)[1],
        np.asarray(ei), 10)
    assert r_full >= r_small  # more probes never hurt
    assert r_small > 0.2      # queries near corpus points: few probes ok


def test_score_decomposition_exact(built):
    """ADC score must equal q.centroid + q.decoded_residual exactly
    (float tolerance): reconstruct from codes and compare."""
    pts, q, idx = built
    s, i = ivfpq_topk(idx, jnp.asarray(q), 5, nprobe=128, m=16, bits=4)
    s, i = np.asarray(s), np.asarray(i)
    cent = np.asarray(idx.centroids)
    cbs = np.asarray(idx.codebooks)          # [m, c, dsub]
    pc = np.asarray(idx.packed_codes)
    prows = np.asarray(idx.packed_rows)
    # map original row -> (partition, slot)
    where = {int(r): (p, sl) for p in range(prows.shape[0])
             for sl, r in enumerate(prows[p]) if r >= 0}
    m, _, dsub = cbs.shape
    for qi in range(2):
        for j in range(3):
            row = int(i[qi, j])
            if row not in where:
                continue  # tail row
            p, sl = where[row]
            rec = cbs[np.arange(m), pc[p, sl].astype(int)].reshape(-1)
            want = float(q[qi] @ (cent[p] + rec))
            assert abs(want - s[qi, j]) < 1e-2


def test_validity_mask(built):
    pts, q, idx = built
    n = len(pts)
    _, i_all = ivfpq_topk(idx, jnp.asarray(q), 5, nprobe=128, m=16, bits=4)
    banned = set(np.asarray(i_all).reshape(-1).tolist()) - {-1}
    valid = np.ones((n,), bool)
    valid[list(banned)] = False
    s, i = ivfpq_topk(idx, jnp.asarray(q), 5, jnp.asarray(valid),
                      nprobe=128, m=16, bits=4)
    got = set(np.asarray(i).reshape(-1).tolist()) - {-1}
    assert got.isdisjoint(banned)


def test_all_masked_returns_minus_one(built):
    pts, q, idx = built
    valid = jnp.zeros((len(pts),), bool)
    s, i = ivfpq_topk(idx, jnp.asarray(q), 5, valid, nprobe=8, m=16, bits=4)
    assert np.all(np.asarray(i) == -1)


def test_append_tail_searchable(built):
    pts, q, idx = built
    rng = np.random.default_rng(7)
    fresh = clustered(rng, n=32)
    rows = np.arange(len(pts), len(pts) + 32, dtype=np.int32)
    idx2 = ivfpq_append_tail(idx, jnp.asarray(fresh), jnp.asarray(rows), 0)
    # query AT a fresh vector: it must surface at the top
    qf = jnp.asarray(fresh[:4])
    s, i = ivfpq_topk(idx2, qf, 3, nprobe=128, m=16, bits=4)
    i = np.asarray(i)
    for r in range(4):
        assert rows[r] in i[r], (rows[r], i[r])


def test_append_tail_growth():
    rng = np.random.default_rng(3)
    pts = clustered(rng, n=500, d=32, n_clusters=8)
    idx = build_ivfpq(pts, nlist=8, train_sample=500, tail_capacity=8)
    fill = int(np.sum(np.asarray(idx.tail_rows) >= 0))
    fresh = rng.standard_normal((64, 32)).astype(np.float32)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    rows = np.arange(1000, 1064, dtype=np.int32)
    idx2 = ivfpq_append_tail(idx, jnp.asarray(fresh), jnp.asarray(rows), fill)
    assert idx2.tail_codes.shape[0] >= fill + 64  # pow2 growth happened
    s, i = ivfpq_topk(idx2, jnp.asarray(fresh[:2]), 2, nprobe=8,
                      m=8, bits=4)
    assert rows[0] in np.asarray(i)[0]


def test_tiny_corpus_k_exceeds_rows():
    rng = np.random.default_rng(4)
    pts = clustered(rng, n=20, d=16, n_clusters=2)
    idx = build_ivfpq(pts, nlist=2, train_sample=20)
    s, i = ivfpq_topk(idx, jnp.asarray(pts[:2]), 50, nprobe=2, m=4, bits=4)
    i = np.asarray(i)
    assert np.sum(i[0] >= 0) == 20  # every real row returned once
    assert len(set(i[0][i[0] >= 0].tolist())) == 20


# -- DenseIndex / manager / checkpoint integration ---------------------------


def test_dense_index_ivfpq_lifecycle(tmp_path):
    """build_pq + build_ivfpq -> search routes through IVF-PQ with exact
    refinement; post-build appends land in the device tail; checkpoint
    round-trips both quantizers."""
    from advanced_rag_tpu.config import IndexConfig
    from advanced_rag_tpu.index.dense_index import DenseIndex

    rng = np.random.default_rng(11)
    pts = clustered(rng, n=800, d=32, n_clusters=64)
    idx = DenseIndex(IndexConfig(dim=32, dtype="pq", min_capacity=64))
    idx.append(0, pts)
    idx.build_pq()
    idx.build_ivf(nlist=32)          # pq mode -> IVF-PQ
    assert idx.has_ivfpq
    idx.config.nprobe = 32

    s, i = idx.search(pts[:4], 5)
    i = np.asarray(i)
    for r in range(4):
        assert i[r, 0] == r          # self-query, exact-refined

    # streaming append goes into the residual-coded tail
    fresh = rng.standard_normal((16, 32)).astype(np.float32)
    idx.append(800, fresh)
    assert idx._ivfpq_fill >= 16
    s2, i2 = idx.search(fresh[:2], 3)
    i2 = np.asarray(i2)
    assert i2[0, 0] == 800 and i2[1, 0] == 801


def test_dense_index_ivfpq_without_flat_pq_sees_appends():
    """ADVICE r1 (medium): build_ivfpq reached WITHOUT build_pq (public
    build_ivf() redirects on dtype="pq") left _pq None, and the tail
    append was nested under `if self._pq is not None` — streamed rows
    were silently invisible to search until the maintenance rebuild."""
    from advanced_rag_tpu.config import IndexConfig
    from advanced_rag_tpu.index.dense_index import DenseIndex

    rng = np.random.default_rng(17)
    pts = clustered(rng, n=800, d=32, n_clusters=64)
    idx = DenseIndex(IndexConfig(dim=32, dtype="pq", min_capacity=64))
    idx.append(0, pts)
    idx.build_ivf(nlist=32)          # pq mode -> IVF-PQ, _pq stays None
    assert idx.has_ivfpq and not idx.has_pq
    idx.config.nprobe = 32

    fresh = rng.standard_normal((8, 32)).astype(np.float32)
    idx.append(800, fresh)
    assert idx._ivfpq_fill >= 8
    _, rows = idx.search(fresh[:2], 3)
    rows = np.asarray(rows)
    assert rows[0, 0] == 800 and rows[1, 0] == 801


def test_checkpoint_restore_overrides_config_pq_geometry(tmp_path):
    """ADVICE r1: a checkpoint saved at pq_bits=8 restored under a
    config with different pq_bits must search with the PERSISTED
    geometry (config is overwritten on load), not silently ADC-sum a
    fraction of the code values."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils.checkpoint import load_index, save_index

    cfg = PipelineConfig()
    cfg.semantic_dtype = "pq"
    cfg.semantic_dim = 32
    mgr = MultiIndexManager(cfg, enable_sparse=False)
    mgr.semantic.config.pq_bits = 8   # geometry lives on IndexConfig
    mgr.semantic.config.pq_m = 8
    recs = [ChunkRecord(chunk_id=f"c{i}", doc_id="d", content=f"text {i}")
            for i in range(300)]
    mgr.index_chunks(recs)
    mgr.semantic.build_pq()
    mgr.semantic.build_ivfpq(nlist=8)
    save_index(mgr, tmp_path)

    cfg2 = PipelineConfig()
    cfg2.semantic_dtype = "pq"
    cfg2.semantic_dim = 32
    mgr2 = MultiIndexManager(cfg2, enable_sparse=False)
    assert mgr2.semantic.config.pq_bits == 4  # mismatched default
    load_index(mgr2, tmp_path)
    assert mgr2.semantic.config.pq_bits == 8
    assert mgr2.semantic.config.pq_m == 8
    q = mgr2.semantic._host[5][None, :]
    _, rows = mgr2.semantic.search(q, 3)
    assert np.asarray(rows)[0, 0] == 5


def test_tune_nprobe_ivfpq():
    from advanced_rag_tpu.config import IndexConfig
    from advanced_rag_tpu.index.dense_index import DenseIndex

    rng = np.random.default_rng(12)
    pts = clustered(rng, n=2000, d=32, n_clusters=128)
    idx = DenseIndex(IndexConfig(dim=32, dtype="pq", min_capacity=64))
    idx.append(0, pts)
    idx.build_pq()
    idx.build_ivfpq(nlist=64)
    npb, rec = idx.tune_nprobe(recall_target=0.9, k=5, sample=32)
    assert idx.config.nprobe == npb
    assert rec >= 0.9 or npb == 64  # met target or maxed out


def test_manager_maintenance_builds_ivfpq(monkeypatch):
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 32)
    mgr = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 3}",
                    content=f"chunk {j} about tpu sharding topic {j % 7}")
        for j in range(48)
    ]
    assert mgr.index_chunks(chunks)["indexed"] == 48
    actions = mgr.maintenance_tick()
    assert actions.get("pq_built")
    assert mgr.semantic.has_pq and mgr.semantic.has_ivfpq
    hits = mgr.search_sync("semantic", "tpu sharding topic 3", 5)
    assert len(hits) > 0


def test_checkpoint_roundtrip_ivfpq(tmp_path):
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils.checkpoint import load_index, save_index

    cfg = PipelineConfig(semantic_dtype="pq")
    mgr = MultiIndexManager(config=cfg)
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 2}",
                    content=f"pallas vmem kernel number {j}")
        for j in range(40)
    ]
    mgr.index_chunks(chunks)
    mgr.semantic.build_pq()
    mgr.semantic.build_ivfpq(nlist=8)
    save_index(mgr, tmp_path)

    mgr2 = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    load_index(mgr2, tmp_path)
    assert mgr2.semantic.has_pq and mgr2.semantic.has_ivfpq
    np.testing.assert_allclose(
        np.asarray(mgr2.semantic._ivfpq.centroids),
        np.asarray(mgr.semantic._ivfpq.centroids), rtol=1e-6)
    h1 = mgr.search_sync("semantic", "pallas vmem kernel number 7", 3)
    h2 = mgr2.search_sync("semantic", "pallas vmem kernel number 7", 3)
    assert h1[0]["chunk_id"] == h2[0]["chunk_id"]


def test_maintenance_opq_skips_ivfpq(monkeypatch):
    """semantic_opq + threshold crossing must NOT raise: OPQ and IVF-PQ
    are exclusive, so maintenance builds the rotated flat codes only
    (regression: build_ivfpq after an OPQ build raised every tick)."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 16)
    mgr = MultiIndexManager(config=PipelineConfig(
        semantic_dtype="pq", semantic_opq=True))
    chunks = [ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                          content=f"opq corpus row {j} term {j % 5}")
              for j in range(24)]
    mgr.index_chunks(chunks)
    actions = mgr.maintenance_tick()
    assert actions.get("pq_built")
    assert mgr.semantic.has_pq and mgr.semantic._pq_rot is not None
    assert not mgr.semantic.has_ivfpq
    # second tick is a clean no-op, not a crash loop
    actions2 = mgr.maintenance_tick()
    assert not actions2.get("pq_built")
    hits = mgr.hybrid_search_batch_sync(["opq corpus row 7"], 3)[0]
    assert any(h["chunk_id"] == "c7" for h in hits)


def test_maintenance_demotion_blocked_on_adversarial_recall(monkeypatch):
    """Recall guardrail (VERDICT r3 weak #6): a corpus whose PQ tier
    cannot hit the configured recall target at ANY swept nprobe must
    NOT be auto-demoted — maintenance restores the bf16 staging tier
    (same array object, build-then-swap rollback), records the refusal,
    and retrieval keeps serving.  Hostile geometry here = 8 sub-
    quantizers over 384 dims at 4 bits with NO exact refinement: raw
    ADC ranks can't reach recall@10 0.999."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 32)
    mgr = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    chunks = [
        ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j % 5}",
                    content=f"adversarial corpus row {j} topic {j % 11}")
        for j in range(64)
    ]
    assert mgr.index_chunks(chunks)["indexed"] == 64
    sem = mgr.semantic
    sem.config.pq_m = 8             # 48 dims/subspace: hostile compression
    sem.config.refine_factor = 1    # no refinement: probe raw ADC ranks
    sem.config.demote_recall_target = 0.999
    staged = sem.emb
    actions = mgr.maintenance_tick()
    blocked = actions.get("demotion_blocked")
    assert blocked and blocked["tier"] == "pq+ivfpq"
    assert blocked["recall"] < 0.999
    assert not actions.get("pq_built")
    assert not sem.has_pq and not sem.has_ivfpq
    assert sem.emb is staged        # bf16 staging restored, no re-upload
    hits = mgr.search_sync("semantic", "adversarial corpus row 7", 3)
    assert hits
    # operator relaxes the target: the SAME corpus now demotes
    sem.config.demote_recall_target = 0.0
    actions2 = mgr.maintenance_tick()
    assert actions2.get("pq_built") and sem.has_pq and sem.has_ivfpq
