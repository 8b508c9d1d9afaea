"""IVF partitioned ANN: recall vs exact oracle, masks, overflow tail.

The HNSW-parity check from SURVEY.md §6/§7: recall@10 vs brute force on
clustered data (real embedding distributions are clustered; IVF recall
on them is the meaningful metric).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import IndexConfig, IndexType, Metric
from advanced_rag_tpu.index.dense_index import DenseIndex
from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.ivf import auto_nlist, build_ivf, ivf_topk, kmeans_fit, kmeans_init


def _clustered(rng, n=8192, d=32, n_clusters=64):
    """Mixture of Gaussians, normalized (cosine geometry)."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    which = rng.integers(0, n_clusters, n)
    x = centers[which] + rng.standard_normal((n, d)).astype(np.float32) * 0.4
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _recall(got_ids, ref_ids):
    hits = 0
    for g, r in zip(np.asarray(got_ids), np.asarray(ref_ids)):
        hits += len(set(g.tolist()) & set(r.tolist()))
    return hits / ref_ids.size


class TestKMeans:
    def test_centroids_reduce_distortion(self, rng):
        x = _clustered(rng, n=2048, d=16, n_clusters=16)
        init = kmeans_init(x, 16, seed=0)
        fit = np.asarray(kmeans_fit(jnp.asarray(x), jnp.asarray(init),
                                    nlist=16, iters=10))

        def distortion(c):
            s = x @ c.T
            return float(np.mean(np.max(s, axis=1)))

        assert distortion(fit) > distortion(init)

    def test_auto_nlist(self):
        assert auto_nlist(1_000_000) == 1000
        assert auto_nlist(1_000_000, factor=4.0) == 4000
        assert auto_nlist(1) == 8


class TestIVFSearch:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(0)
        x = _clustered(rng, n=8192, d=32)
        q = _clustered(rng, n=16, d=32, n_clusters=8)
        parts = build_ivf(x, nlist=64, kmeans_iters=10, seed=0)
        ref_s, ref_i = dense_topk(jnp.asarray(x), jnp.asarray(q), 10,
                                  metric="ip")
        return x, q, parts, ref_i

    def test_recall_at_10(self, data):
        x, q, parts, ref_i = data
        _, got_i = ivf_topk(parts, jnp.asarray(q), 10, nprobe=16)
        assert _recall(got_i, np.asarray(ref_i)) >= 0.95

    def test_full_probe_is_exact(self, data):
        """nprobe == nlist at f32 storage reproduces brute force exactly
        (bf16 storage flips near-ties: ~0.98 — still above the HNSW bar)."""
        x, q, _, ref_i = data
        parts32 = build_ivf(x, nlist=64, kmeans_iters=10, seed=0,
                            dtype="float32")
        _, got_i = ivf_topk(parts32, jnp.asarray(q), 10, nprobe=64)
        assert _recall(got_i, np.asarray(ref_i)) == 1.0

    def test_mask_respected(self, data):
        x, q, parts, _ = data
        valid = np.zeros(x.shape[0], bool)
        valid[:100] = True
        _, got_i = ivf_topk(parts, jnp.asarray(q), 10,
                            jnp.asarray(valid), nprobe=64)
        ids = np.asarray(got_i)
        assert ((ids < 100) | (ids == -1)).all()

    def test_overflow_tail_preserves_recall(self, rng):
        """Tiny capacity factor forces spills; tail scan keeps recall=1
        at full probe."""
        x = _clustered(rng, n=2048, d=16)
        parts = build_ivf(x, nlist=16, kmeans_iters=5,
                          capacity_factor=0.5, seed=0, dtype="float32")
        assert parts.tail_emb.shape[0] > 1  # spills happened
        q = x[:4]
        ref_s, ref_i = dense_topk(jnp.asarray(x), jnp.asarray(q), 5,
                                  metric="ip")
        _, got_i = ivf_topk(parts, jnp.asarray(q), 5, nprobe=16)
        assert _recall(got_i, np.asarray(ref_i)) == 1.0


class TestDenseIndexIVF:
    def test_index_dispatches_to_ivf(self, rng):
        x = _clustered(rng, n=4096, d=32)
        idx = DenseIndex(IndexConfig(index_type=IndexType.SEMANTIC, dim=32,
                                     metric=Metric.COSINE, nprobe=16))
        idx.append(0, x)
        s_flat, i_flat = idx.search(x[:4], 5)
        idx.build_ivf(nlist=64)
        assert idx.has_ivf
        s_ivf, i_ivf = idx.search(x[:4], 5)
        # self-query top-1 must be the row itself on both paths
        np.testing.assert_array_equal(np.asarray(i_ivf)[:, 0], np.arange(4))
        # streaming ingest: quantizer stays valid, appended rows form an
        # exact-scan tail and are still retrievable
        fresh = _clustered(np.random.default_rng(9), n=8, d=32)
        idx.append(4096, fresh)
        assert idx.has_ivf and idx.ivf_tail_rows == 8
        s2, i2 = idx.search(fresh[:2], 3)
        assert 4096 in np.asarray(i2)[0] or 4097 in np.asarray(i2)[0]
        # rebuild recommendation once the tail outgrows the threshold
        assert not idx.ivf_needs_rebuild
        idx.append(4104, _clustered(np.random.default_rng(10), n=2048, d=32))
        assert idx.ivf_needs_rebuild


class TestNprobeTuning:
    def test_tune_nprobe_meets_target(self, rng):
        from advanced_rag_tpu.ops.ivf import tune_nprobe

        # f32 partitions: the oracle is exact f32 search, so storage
        # rounding must not cap achievable recall below the target
        x = _clustered(rng, n=8192, d=32)
        parts = build_ivf(x, nlist=64, kmeans_iters=10, seed=0,
                          dtype="float32")
        q = x[rng.integers(0, len(x), 32)]
        _, oracle = dense_topk(jnp.asarray(x), jnp.asarray(q), 10,
                               metric="ip", normalize_queries=False)
        npb, rec = tune_nprobe(parts, q, np.asarray(oracle),
                               recall_target=0.9, k=10)
        assert rec >= 0.9
        assert 1 <= npb <= 64
        # a stricter target costs at least as many probes
        npb2, rec2 = tune_nprobe(parts, q, np.asarray(oracle),
                                 recall_target=0.99, k=10)
        assert npb2 >= npb and rec2 >= 0.9

    def test_dense_index_tune_updates_config(self, rng):
        cfg = IndexConfig(dim=32, min_capacity=64, nprobe=4)
        idx = DenseIndex(cfg)
        x = _clustered(rng, n=4096, d=32)
        idx.append(0, x)
        idx.build_ivf(nlist=32)
        npb, rec = idx.tune_nprobe(recall_target=0.9, k=10, sample=16)
        assert idx.config.nprobe == npb
        assert rec >= 0.9

    def test_dense_index_tune_with_real_queries(self, rng):
        """Off-corpus queries (the serving distribution) may need a
        larger nprobe than self-queries — tune_nprobe(queries=...)
        measures recall against THEM (dense_index docstring note)."""
        cfg = IndexConfig(dim=32, min_capacity=64, nprobe=4)
        idx = DenseIndex(cfg)
        x = _clustered(rng, n=4096, d=32)
        idx.append(0, x)
        idx.build_ivf(nlist=32)
        q = x[rng.integers(0, 4096, 24)] + 0.3 * rng.standard_normal(
            (24, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        npb, rec = idx.tune_nprobe(recall_target=0.9, k=10, sample=24,
                                   queries=q)
        assert idx.config.nprobe == npb
        assert rec >= 0.9 or npb == 32   # met target or went full-probe


class TestMaintenance:
    def _mgr(self, rng, n=512):
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager
        from advanced_rag_tpu.config import PipelineConfig

        mgr = MultiIndexManager(config=PipelineConfig(semantic_dim=32),
                                enable_sparse=False)
        recs = [ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j%5}",
                            content=f"text number {j} about subject {j%7}")
                for j in range(n)]
        mgr.index_chunks(recs)
        return mgr

    def test_tick_rebuilds_when_tail_exceeds_fraction(self, rng):
        from advanced_rag_tpu.index.corpus import ChunkRecord

        mgr = self._mgr(rng, n=512)
        mgr.semantic.build_ivf(nlist=16)
        assert mgr.maintenance_tick() == {"ivf_rebuilt": False}
        # append a tail > REBUILD_TAIL_FRACTION of the corpus
        recs = [ChunkRecord(chunk_id=f"t{j}", doc_id="dt",
                            content=f"tail chunk {j} fresh content")
                for j in range(256)]
        mgr.index_chunks(recs)
        assert mgr.semantic.ivf_needs_rebuild
        out = mgr.maintenance_tick()
        assert out["ivf_rebuilt"] and out["ivf_rows"] == 768
        assert not mgr.semantic.ivf_needs_rebuild
        # search still correct after the swap: a stored row finds itself
        qv = mgr.semantic._host[700:701]
        _, ids = mgr.semantic.search(qv, 5, mgr.store.valid_mask)
        assert int(np.asarray(ids)[0, 0]) == 700

    def test_background_thread_start_stop(self, rng):
        mgr = self._mgr(rng, n=64)
        mgr.start_maintenance(interval_s=0.05)
        assert mgr._maint_thread.is_alive()
        mgr.start_maintenance()  # idempotent
        mgr.close()
        assert mgr._maint_thread is None


class TestHybridIVF:
    """dense_impl='ivf' inside the fused hybrid program, incl. the
    exact-scan tail for rows appended after the build."""

    def _mgr(self, rng, n=512, dtype="bfloat16"):
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager
        from advanced_rag_tpu.config import PipelineConfig

        mgr = MultiIndexManager(
            config=PipelineConfig(semantic_dim=32, semantic_dtype=dtype))
        recs = [ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j%5}",
                            content=f"text number {j} about subject {j%7}")
                for j in range(n)]
        mgr.index_chunks(recs)
        return mgr

    @pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
    def test_fused_hybrid_uses_ivf_and_finds_tail(self, rng, dtype):
        from advanced_rag_tpu.index.corpus import ChunkRecord

        mgr = self._mgr(rng, n=512, dtype=dtype)
        flat = [h["chunk_id"] for h in
                mgr.hybrid_search_batch_sync(["text number 77"], 5)[0]]
        mgr.semantic.build_ivf(nlist=16)
        # full probe -> parity with the flat-scan hybrid ranking
        mgr.semantic.config.nprobe = 16
        hits = mgr.hybrid_search_batch_sync(["text number 77"], 5)[0]
        assert [h["chunk_id"] for h in hits] == flat
        assert "c77" in {h["chunk_id"] for h in hits}

        # appended tail after the build must be retrievable
        recs = [ChunkRecord(chunk_id=f"t{j}", doc_id="dt",
                            content=f"unique zanzibar quokka {j} document")
                for j in range(16)]
        mgr.index_chunks(recs)
        assert mgr.semantic.ivf_tail_rows == 16
        hits = mgr.hybrid_search_batch_sync(["unique zanzibar quokka 7"], 5)[0]
        assert hits and hits[0]["chunk_id"] == "t7"

        # rebuild absorbs the tail; search still correct
        mgr.maintenance_tick()
        hits = mgr.hybrid_search_batch_sync(["unique zanzibar quokka 7"], 5)[0]
        assert hits and hits[0]["chunk_id"] == "t7"


def test_maintenance_auto_builds_ivf_at_threshold(rng, monkeypatch):
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 256)
    mgr = MultiIndexManager(config=PipelineConfig(semantic_dim=16),
                            enable_sparse=False)
    recs = [ChunkRecord(chunk_id=f"c{j}", doc_id="d",
                        content=f"auto build text {j}") for j in range(300)]
    mgr.index_chunks(recs)
    assert not mgr.semantic.has_ivf
    out = mgr.maintenance_tick()
    assert out["ivf_rebuilt"] and mgr.semantic.has_ivf
    # search still self-consistent through the new quantizer
    qv = mgr.semantic._host[123:124]
    _, ids = mgr.semantic.search(qv, 3, mgr.store.valid_mask)
    assert int(np.asarray(ids)[0, 0]) == 123


def test_maintenance_ivf_demotion_rollback(monkeypatch):
    """IVF branch of the recall guardrail: when the probe reports a
    recall below target, the freshly built partitions are discarded and
    the exact-scan tier (no _ivf) kept, with nprobe untouched."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.dense_index import DenseIndex
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 32)
    mgr = MultiIndexManager(config=PipelineConfig())
    chunks = [ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                          content=f"ivf guard row {j} term {j % 9}")
              for j in range(48)]
    mgr.index_chunks(chunks)
    nprobe0 = mgr.semantic.config.nprobe
    # deterministic low-recall probe: the guard must roll back on it
    monkeypatch.setattr(DenseIndex, "tune_nprobe",
                        lambda self, **kw: (99, 0.42))
    actions = mgr.maintenance_tick()
    assert actions.get("demotion_blocked", {}).get("tier") == "ivf"
    assert not actions["ivf_rebuilt"]
    assert not mgr.semantic.has_ivf
    assert mgr.semantic.config.nprobe == nprobe0
    assert mgr.search_sync("semantic", "ivf guard row 3", 3)
