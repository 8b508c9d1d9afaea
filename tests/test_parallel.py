"""Sharded search == single-device search, on a virtual 8-device mesh.

The reference's sharding (Milvus num_shards=4, indexing.py:234-239) is
never tested; here the invariant is exact: the shard_map program must
return the same ids/scores as the one-chip program for dense, and
bit-comparable scores for BM25 (global df + psum'd avg_len).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.config import MeshConfig
from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.sparse import sparse_topk
from advanced_rag_tpu.parallel import (
    build_mesh,
    gather_merge_topk,
    pad_to_shards,
    shard_corpus_arrays,
    sharded_dense_topk,
    sharded_sparse_topk,
    tree_merge_topk,
)


@pytest.fixture(scope="module")
def mesh8():
    return build_mesh(MeshConfig(mesh_shape=(8, 1)))


@pytest.fixture(scope="module")
def mesh42():
    return build_mesh(MeshConfig(mesh_shape=(4, 2)))


def _sorted_rows(scores, ids):
    """Canonicalize ties: sort each row by (-score, id)."""
    order = np.lexsort((np.asarray(ids), -np.asarray(scores)), axis=-1)
    return (
        np.take_along_axis(np.asarray(scores), order, -1),
        np.take_along_axis(np.asarray(ids), order, -1),
    )


class TestShardedDense:
    def test_matches_single_device(self, mesh8, rng):
        n, d, q, k = 1024, 32, 4, 10
        emb = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        valid = np.ones(n, bool)
        valid[100:200] = False

        ref_s, ref_i = dense_topk(jnp.asarray(emb), jnp.asarray(queries), k,
                                  jnp.asarray(valid), metric="ip")
        emb_s, valid_s = shard_corpus_arrays(mesh8, emb, valid)
        got_s, got_i = sharded_dense_topk(
            emb_s, jnp.asarray(queries), k, valid_s, mesh=mesh8, metric="ip"
        )
        rs, ri = _sorted_rows(ref_s, ref_i)
        gs, gi = _sorted_rows(got_s, got_i)
        np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(gi, ri)

    def test_padded_corpus(self, mesh8, rng):
        """N not divisible by shards: pad rows, mark invalid."""
        n, d, k = 1000, 16, 5
        emb = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((2, d)).astype(np.float32)
        valid = np.ones(n, bool)

        ref_s, ref_i = dense_topk(jnp.asarray(emb), jnp.asarray(queries), k,
                                  jnp.asarray(valid), metric="ip")
        emb_p = pad_to_shards(emb, 8)
        valid_p = pad_to_shards(valid, 8)  # padded rows False
        emb_s, valid_s = shard_corpus_arrays(mesh8, emb_p, valid_p)
        got_s, got_i = sharded_dense_topk(
            emb_s, jnp.asarray(queries), k, valid_s, mesh=mesh8, metric="ip"
        )
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                                   rtol=1e-5, atol=1e-5)

    def test_query_data_sharding(self, mesh42, rng):
        """Queries sharded over the data axis of a 4x2 mesh."""
        n, d, q, k = 512, 16, 8, 7
        emb = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        ref_s, ref_i = dense_topk(jnp.asarray(emb), jnp.asarray(queries), k,
                                  metric="ip")
        emb_s = shard_corpus_arrays(mesh42, emb)
        got_s, got_i = sharded_dense_topk(
            emb_s, jnp.asarray(queries), k, None, mesh=mesh42, metric="ip"
        )
        rs, ri = _sorted_rows(ref_s, ref_i)
        gs, gi = _sorted_rows(got_s, got_i)
        np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(gi, ri)

    def test_all_masked(self, mesh8, rng):
        emb = rng.standard_normal((64, 8)).astype(np.float32)
        queries = rng.standard_normal((1, 8)).astype(np.float32)
        valid = np.zeros(64, bool)
        emb_s, valid_s = shard_corpus_arrays(mesh8, emb, valid)
        s, i = sharded_dense_topk(emb_s, jnp.asarray(queries), 5, valid_s,
                                  mesh=mesh8, metric="ip")
        assert (np.asarray(i) == -1).all()


class TestShardedSparse:
    def test_matches_single_device(self, mesh8, rng):
        from advanced_rag_tpu.index.text import encode_documents, encode_queries

        docs = [
            f"the quick brown fox {w} jumps over the lazy dog number {i}"
            for i, w in enumerate(
                ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"] * 20
            )
        ]
        vocab, nnz = 4096, 32
        doc_idx, doc_tf, doc_len, df = encode_documents(docs, vocab, nnz)
        q_idx, q_tf = encode_queries(["quick gamma fox", "lazy delta dog"],
                                     vocab, 16)
        n = len(docs)
        n_docs = jnp.float32(n)
        k = 8

        ref_s, ref_i = sparse_topk(
            jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
            jnp.asarray(df), n_docs, jnp.asarray(q_idx), jnp.asarray(q_tf), k,
        )
        pad = lambda a, fill=0: pad_to_shards(a, 8, fill)
        di, dt, dl, v = shard_corpus_arrays(
            mesh8, pad(doc_idx, -1), pad(doc_tf), pad(doc_len),
            pad(np.ones(n, bool), False),
        )
        got_s, got_i = sharded_sparse_topk(
            di, dt, dl, jnp.asarray(df), n_docs,
            jnp.asarray(q_idx), jnp.asarray(q_tf), k, v, mesh=mesh8,
        )
        rs, ri = _sorted_rows(ref_s, ref_i)
        gs, gi = _sorted_rows(got_s, got_i)
        np.testing.assert_allclose(gs, rs, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(gi, ri)


class TestMergePrimitives:
    def test_tree_equals_gather(self, mesh8, rng):
        """Both merge strategies agree inside the same shard_map."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        k = 6
        scores = rng.standard_normal((8, 3, k)).astype(np.float32)
        ids = rng.integers(0, 10_000, (8, 3, k)).astype(np.int32)

        def run(merge):
            def local(s, i):
                return merge(s[0], i[0], k, "shard")

            fn = shard_map(
                local, mesh=mesh8,
                in_specs=(P("shard"), P("shard")),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )
            return fn(jnp.asarray(scores), jnp.asarray(ids))

        gs, gi = run(gather_merge_topk)
        ts, ti = run(lambda s, i, k_, ax: tree_merge_topk(s, i, k_, ax, 8))
        np.testing.assert_allclose(np.asarray(ts), np.asarray(gs))
        rs, ri = _sorted_rows(gs, gi)
        xs, xi = _sorted_rows(ts, ti)
        np.testing.assert_array_equal(xi, ri)


def test_sharded_dense_sq8_matches_unsharded(rng):
    """int8 codes + row-sharded scales through the sharded program."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from advanced_rag_tpu.config import MeshConfig
    from advanced_rag_tpu.ops.quant import dense_topk_sq8, sq8_quantize_host
    from advanced_rag_tpu.parallel import build_mesh, sharded_dense_topk

    mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
    n, d, k = 1024, 32, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    codes, scale = sq8_quantize_host(emb)
    q = emb[rng.integers(0, n, 3)]

    ref_s, ref_i = dense_topk_sq8(jnp.asarray(codes), jnp.asarray(scale),
                                  jnp.asarray(q), k, metric="ip",
                                  normalize_queries=False)

    c_sh = jax.device_put(jnp.asarray(codes),
                          NamedSharding(mesh, P("shard", None)))
    s_sh = jax.device_put(jnp.asarray(scale), NamedSharding(mesh, P("shard")))
    got_s, got_i = sharded_dense_topk(c_sh, jnp.asarray(q), k, None, s_sh,
                                      mesh=mesh, metric="ip")
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(np.asarray(got_i), np.asarray(ref_i)):
        assert len(set(a.tolist()) & set(b.tolist())) >= k - 1


class TestMeshHelpers:
    """parallel/mesh.py construction edges."""

    def test_mismatched_shape_raises(self):
        with pytest.raises(ValueError, match="does not cover"):
            build_mesh(MeshConfig(mesh_shape=(3, 2)))

    def test_default_shape_puts_all_devices_on_shard_axis(self):
        mesh = build_mesh(MeshConfig(mesh_shape=None))
        assert mesh.shape["shard"] == len(jax.devices())
        assert mesh.shape["data"] == 1

    def test_single_device_mesh(self):
        from advanced_rag_tpu.parallel.mesh import single_device_mesh
        mesh = single_device_mesh()
        assert mesh.shape == {"shard": 1, "data": 1}

    def test_replicated_and_corpus_sharding_specs(self):
        from jax.sharding import PartitionSpec as P
        from advanced_rag_tpu.parallel.mesh import corpus_sharding, replicated
        mesh = build_mesh(MeshConfig(mesh_shape=(8, 1)))
        assert corpus_sharding(mesh, ndim=2).spec == P("shard", None)
        assert corpus_sharding(mesh, ndim=1).spec == P("shard")
        assert replicated(mesh, ndim=3).spec == P(None, None, None)

    def test_pad_to_shards_noop_when_divisible(self):
        arr = np.ones((16, 3), np.float32)
        assert pad_to_shards(arr, 8) is arr
        padded = pad_to_shards(np.ones((10, 3), np.float32), 8, fill=-1)
        assert padded.shape == (16, 3)
        assert (padded[10:] == -1).all()
