"""Index-layer edge paths: tier-build guards, SQ8 legs, sparse growth,
hybrid impl rungs, sharded validation, and the HNSW baseline surface."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import IndexConfig, IndexType, Metric
from advanced_rag_tpu.index.dense_index import DenseIndex
from advanced_rag_tpu.index.sparse_index import SparseIndex


def _vecs(rng, n, d=32):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestDenseBuildGuards:
    def test_build_ivf_empty_raises(self):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=64))
        with pytest.raises(ValueError, match="empty index"):
            idx.build_ivf(nlist=2)

    def test_build_pq_empty_and_wrong_dtype(self):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=64, dtype="pq"))
        with pytest.raises(ValueError, match="empty index"):
            idx.build_pq()
        flat = DenseIndex(IndexConfig(dim=16, min_capacity=64))
        rng = np.random.default_rng(0)
        flat.append(0, _vecs(rng, 8, 16))
        with pytest.raises(ValueError, match='dtype="pq"'):
            flat.build_ivfpq(nlist=2)

    def test_build_ivfpq_empty_raises(self, rng):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=64, dtype="pq"))
        with pytest.raises(ValueError, match="empty index"):
            idx.build_ivfpq(nlist=2)

    def test_tune_nprobe_requires_ivf(self, rng):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=64))
        idx.append(0, _vecs(rng, 10, 16))
        with pytest.raises(ValueError, match="requires a built IVF"):
            idx.tune_nprobe()


class TestSq8Legs:
    def test_tune_nprobe_on_sq8_tier(self, rng):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=256, dtype="int8",
                                     metric=Metric.INNER_PRODUCT))
        idx.append(0, _vecs(rng, 200, 16))
        idx.build_ivf(nlist=4)
        npb, recall = idx.tune_nprobe(recall_target=0.9, k=5, sample=16)
        assert 1 <= npb <= 4 and 0.0 <= recall <= 1.0

    def test_sq8_ivf_streaming_tail_visible(self, rng):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=256, dtype="int8",
                                     metric=Metric.INNER_PRODUCT))
        base = _vecs(rng, 120, 16)
        idx.append(0, base)
        idx.build_ivf(nlist=4)
        tail = _vecs(rng, 5, 16)
        idx.append(120, tail)
        # a query equal to a tail row must surface it via the tail scan
        s, i = idx.search(tail[:1], 3)
        assert 120 in np.asarray(i)[0].tolist()
        assert np.asarray(s)[0, 0] == pytest.approx(1.0, abs=0.05)


class TestSparseGrowth:
    def test_capacity_doubles_and_search_survives(self):
        cfg = IndexConfig(index_type=IndexType.SPARSE, min_capacity=8)
        sp = SparseIndex(cfg)
        texts = [f"growth document number {i} with unique term zebra{i}"
                 for i in range(20)]
        sp.append_texts(0, texts)           # 20 rows > 8 capacity
        assert sp.capacity >= 20 and sp.size == 20
        s, i = sp.search_texts(["zebra7"], 3)
        assert np.asarray(i)[0, 0] == 7

    def test_remove_rows_out_of_range_noop(self):
        cfg = IndexConfig(index_type=IndexType.SPARSE, min_capacity=8)
        sp = SparseIndex(cfg)
        sp.append_texts(0, ["one document here"])
        df_before = sp._df.copy()
        sp.remove_rows([99, -4])
        np.testing.assert_array_equal(sp._df, df_before)


class TestHybridImplRungs:
    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(3)
        n, d, v, p, t = 64, 16, 128, 6, 4
        emb = _vecs(rng, n, d)
        doc_idx = rng.integers(0, v, size=(n, p)).astype(np.int32)
        doc_tf = rng.integers(1, 3, size=(n, p)).astype(np.float32)
        doc_len = rng.integers(10, 40, size=n).astype(np.float32)
        df = np.bincount(doc_idx.ravel(), minlength=v).astype(np.int32)
        q_dense = _vecs(rng, 2, d)
        q_idx = rng.integers(0, v, size=(2, t)).astype(np.int32)
        q_tf = np.ones((2, t), np.float32)
        return emb, doc_idx, doc_tf, doc_len, df, q_dense, q_idx, q_tf

    def test_sq8_dense_rung(self, corpus):
        from advanced_rag_tpu.ops.hybrid import hybrid_retrieve
        from advanced_rag_tpu.ops.quant import sq8_quantize_host

        emb, doc_idx, doc_tf, doc_len, df, q_dense, q_idx, q_tf = corpus
        codes, scale = sq8_quantize_host(emb)
        out = hybrid_retrieve(
            jnp.asarray(codes), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
            jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(64),
            jnp.asarray(q_dense), jnp.asarray(q_idx), jnp.asarray(q_tf),
            None, jnp.asarray([0.7, 0.3], jnp.float32),
            jnp.float32(0.8), emb_scale=jnp.asarray(scale),
            k_cand=8, k_out=8, metric="ip", dense_impl="sq8")
        ids = np.asarray(out.ids)
        assert ids.shape[0] == 2 and (ids >= 0).any()

    def test_pallas_sparse_rung(self, corpus):
        from advanced_rag_tpu.ops.hybrid import hybrid_retrieve

        emb, doc_idx, doc_tf, doc_len, df, q_dense, q_idx, q_tf = corpus
        out_p = hybrid_retrieve(
            jnp.asarray(emb, jnp.bfloat16), jnp.asarray(doc_idx),
            jnp.asarray(doc_tf), jnp.asarray(doc_len), jnp.asarray(df),
            jnp.float32(64), jnp.asarray(q_dense), jnp.asarray(q_idx),
            jnp.asarray(q_tf), None, jnp.asarray([0.7, 0.3], jnp.float32),
            jnp.float32(0.8), k_cand=8, k_out=8, metric="ip",
            sparse_impl="pallas")
        out_x = hybrid_retrieve(
            jnp.asarray(emb, jnp.bfloat16), jnp.asarray(doc_idx),
            jnp.asarray(doc_tf), jnp.asarray(doc_len), jnp.asarray(df),
            jnp.float32(64), jnp.asarray(q_dense), jnp.asarray(q_idx),
            jnp.asarray(q_tf), None, jnp.asarray([0.7, 0.3], jnp.float32),
            jnp.float32(0.8), k_cand=8, k_out=8, metric="ip",
            sparse_impl="xla")
        np.testing.assert_array_equal(np.asarray(out_p.ids),
                                      np.asarray(out_x.ids))


class TestShardedValidation:
    def test_pod_rows_not_divisible_raises(self, rng):
        from advanced_rag_tpu.parallel.multihost import (
            build_pod_mesh,
            pod_dense_topk,
        )

        mesh = build_pod_mesh(dcn=2, shard=4, data=1)
        emb = jnp.asarray(_vecs(rng, 10, 8))     # 10 % 8 != 0
        q = jnp.asarray(_vecs(rng, 1, 8))
        with pytest.raises(ValueError, match="not divisible"):
            pod_dense_topk(emb, q, 3, None, mesh=mesh)

    def test_pod_cosine_normalizes_queries(self, rng):
        from advanced_rag_tpu.parallel.multihost import (
            build_pod_mesh,
            pod_dense_topk,
        )

        mesh = build_pod_mesh(dcn=2, shard=4, data=1)
        emb = jnp.asarray(_vecs(rng, 16, 8))
        q = jnp.asarray(3.0 * _vecs(rng, 1, 8))  # unnormalized
        s, i = pod_dense_topk(emb, q, 3, None, mesh=mesh, metric="cosine",
                              normalize_queries=True)
        assert float(np.asarray(s)[0, 0]) <= 1.0 + 1e-3


class TestHNSWBaselineSurface:
    def test_single_query_and_max_level(self, rng):
        hnsw = pytest.importorskip(
            "advanced_rag_tpu.baselines.hnsw", reason="baseline module")
        vecs = _vecs(rng, 200, 16)
        try:
            idx = hnsw.HNSWBaseline(vecs, M=8, ef_construction=40)
        except RuntimeError:
            pytest.skip("native hnsw unavailable")
        _, ids = idx.search(vecs[5], 3, ef=32)      # 1-D query reshapes
        assert 5 in np.asarray(ids).ravel().tolist()
        assert idx.max_level >= 0
