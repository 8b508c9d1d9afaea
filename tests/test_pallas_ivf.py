"""Pallas IVF slab kernel == the XLA gather path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.ops.ivf import build_ivf, ivf_topk
from advanced_rag_tpu.ops.pallas_ivf import ivf_topk_pallas

from test_ivf import _clustered


@pytest.fixture(scope="module")
def parts_and_data():
    rng = np.random.default_rng(0)
    x = _clustered(rng, n=4096, d=32)
    # capacity_factor < 1 forces a non-trivial overflow tail
    parts = build_ivf(x, nlist=64, kmeans_iters=8, seed=0,
                      dtype="float32", capacity_factor=0.9)
    return parts, x


def test_matches_xla_path(parts_and_data):
    parts, x = parts_and_data
    for row in (5, 100, 4000):
        q = jnp.asarray(x[row])
        rs, ri = ivf_topk(parts, q[None], 8, nprobe=16)
        ps, pi = ivf_topk_pallas(parts, q, 8, nprobe=16)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri)[0])
        np.testing.assert_allclose(np.asarray(ps), np.asarray(rs)[0],
                                   rtol=1e-5)
        assert np.asarray(pi)[0] == row  # self-retrieval


def test_mask(parts_and_data):
    parts, x = parts_and_data
    valid = np.zeros(x.shape[0], bool)
    valid[:100] = True
    _, pi = ivf_topk_pallas(parts, jnp.asarray(x[0]), 8,
                            jnp.asarray(valid), nprobe=64)
    ids = np.asarray(pi)
    assert ((ids < 100) | (ids == -1)).all()


def test_batch_matches_xla_path(parts_and_data):
    """ivf_topk_pallas_batch == ivf_topk for a whole query batch."""
    from advanced_rag_tpu.ops.pallas_ivf import ivf_topk_pallas_batch

    parts, x = parts_and_data
    q = jnp.asarray(x[[5, 100, 700, 4000]])
    rs, ri = ivf_topk(parts, q, 8, nprobe=16)
    ps, pi = ivf_topk_pallas_batch(parts, q, 8, nprobe=16)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(rs),
                               rtol=1e-4, atol=1e-4)


def test_batch_validity_mask(parts_and_data):
    from advanced_rag_tpu.ops.pallas_ivf import ivf_topk_pallas_batch

    parts, x = parts_and_data
    q = jnp.asarray(x[[3, 9]])
    _, all_ids = ivf_topk_pallas_batch(parts, q, 5, nprobe=64)
    banned = set(np.asarray(all_ids).reshape(-1).tolist()) - {-1}
    valid = np.ones((len(x),), bool)
    valid[list(banned)] = False
    _, ids = ivf_topk_pallas_batch(parts, q, 5, jnp.asarray(valid),
                                   nprobe=64)
    got = set(np.asarray(ids).reshape(-1).tolist()) - {-1}
    assert got.isdisjoint(banned)


def test_batch_sq8_partitions_match_xla():
    """int8 packed partitions: per-row dequant scales must apply in the
    slab kernel and the tail merge."""
    from advanced_rag_tpu.ops.pallas_ivf import ivf_topk_pallas_batch

    rng = np.random.default_rng(4)
    x = _clustered(rng, n=2048, d=32)
    parts = build_ivf(x, nlist=32, kmeans_iters=6, seed=0,
                      dtype="int8", capacity_factor=0.9)
    q = jnp.asarray(x[[1, 77, 2000]])
    rs, ri = ivf_topk(parts, q, 8, nprobe=8)
    ps, pi = ivf_topk_pallas_batch(parts, q, 8, nprobe=8)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(rs),
                               rtol=1e-4, atol=1e-4)
