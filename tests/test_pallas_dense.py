"""Pallas dense-scan kernels == the XLA paths (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.ops.pallas_dense import (
    dense_topk_pallas,
    dense_topk_sq8_pallas,
)
from advanced_rag_tpu.ops.quant import dense_topk_sq8, sq8_quantize_host


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, d = 5003, 64                     # non-multiple of block exercises pad
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones((n,), bool)
    valid[[7, 100, 5002]] = False
    return emb, q, valid


def test_matches_xla_bf_path(data):
    emb, q, valid = data
    s1, i1 = dense_topk(jnp.asarray(emb), jnp.asarray(q), 10,
                        jnp.asarray(valid), metric="ip",
                        normalize_queries=False)
    s2, i2 = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q), 10,
                               jnp.asarray(valid), metric="ip",
                               normalize_queries=False, reduce="exact",
                               block_size=1024)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_matches_xla_sq8_path(data):
    emb, q, valid = data
    codes, scale = sq8_quantize_host(emb)
    s1, i1 = dense_topk_sq8(jnp.asarray(codes), jnp.asarray(scale),
                            jnp.asarray(q), 10, jnp.asarray(valid),
                            metric="ip", normalize_queries=False)
    s2, i2 = dense_topk_sq8_pallas(jnp.asarray(codes), jnp.asarray(scale),
                                   jnp.asarray(q), 10, jnp.asarray(valid),
                                   metric="ip", normalize_queries=False,
                                   reduce="exact", block_size=1024)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_masked_rows_never_surface(data):
    emb, q, valid = data
    _, ids = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q), 10,
                               jnp.asarray(valid), metric="ip",
                               normalize_queries=False, reduce="exact")
    got = set(np.asarray(ids).reshape(-1).tolist())
    assert got.isdisjoint({7, 100, 5002})


def test_all_masked(data):
    emb, q, _ = data
    _, ids = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q), 5,
                               jnp.zeros((len(emb),), bool),
                               metric="ip", normalize_queries=False,
                               reduce="exact")
    assert (np.asarray(ids) == -1).all()


def test_cosine_normalizes_queries(data):
    emb, q, valid = data
    s1, _ = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(3.0 * q), 5,
                              jnp.asarray(valid), metric="cosine",
                              reduce="exact")
    s2, _ = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q), 5,
                              jnp.asarray(valid), metric="cosine",
                              reduce="exact")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
