"""Dense top-k op vs a numpy brute-force oracle (SURVEY.md §4: pure-math
kernel tests, mirroring the reference's oracle-style metric tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.ops.dense import (
    NEG_INF,
    dense_topk,
    dense_topk_approx,
    l2_normalize,
    merge_topk,
)


def oracle_topk(emb, q, k, metric="cosine", valid=None):
    emb = emb.astype(np.float32)
    q = q.astype(np.float32)
    if metric == "cosine":
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        s = q @ emb.T
    elif metric == "ip":
        s = q @ emb.T
    elif metric == "l2":
        s = -np.sum((q[:, None, :] - emb[None, :, :]) ** 2, axis=-1)
    if valid is not None:
        s = np.where(valid[None, :], s, -1e30)
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_dense_topk_matches_oracle(rng, metric):
    emb = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    s, i = dense_topk(jnp.asarray(emb), jnp.asarray(q), 10, metric=metric,
                      block_size=64)
    os_, oi = oracle_topk(emb, q, 10, metric)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=2e-4, atol=2e-4)
    # ids may differ on ties; require identical score multisets and >=9/10 id overlap
    for row_i, row_oi in zip(np.asarray(i), oi):
        assert len(set(row_i) & set(row_oi)) >= 9


def test_dense_topk_respects_valid_mask(rng):
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    valid = np.zeros(100, dtype=bool)
    valid[10:20] = True
    s, i = dense_topk(jnp.asarray(emb), jnp.asarray(q), 15,
                      jnp.asarray(valid), block_size=32)
    i = np.asarray(i)
    s = np.asarray(s)
    # only 10 valid rows -> last 5 slots padded with -1 / NEG_INF
    assert (i[:, 10:] == -1).all()
    assert (s[:, 10:] <= float(NEG_INF)).all()
    assert np.isin(i[:, :10], np.arange(10, 20)).all()


def test_dense_topk_bf16_storage(rng):
    emb = rng.standard_normal((257, 64)).astype(np.float32)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    s16, i16 = dense_topk(jnp.asarray(emb).astype(jnp.bfloat16), jnp.asarray(q),
                          5, metric="cosine", block_size=128)
    os_, oi = oracle_topk(emb, q, 20, "cosine")
    # bf16 storage: top-5 ids should come from the oracle top-20
    assert np.isin(np.asarray(i16), oi).all()


def test_dense_topk_nonmultiple_block(rng):
    emb = rng.standard_normal((77, 8)).astype(np.float32)
    q = rng.standard_normal((1, 8)).astype(np.float32)
    s, i = dense_topk(jnp.asarray(emb), jnp.asarray(q), 5, metric="ip",
                      block_size=32)
    os_, oi = oracle_topk(emb, q, 5, "ip")
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-4, atol=1e-4)


def test_dense_topk_k_larger_than_n(rng):
    emb = rng.standard_normal((7, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    s, i = dense_topk(jnp.asarray(emb), jnp.asarray(q), 12, metric="ip")
    i = np.asarray(i)
    assert (i[:, 7:] == -1).all()
    assert sorted(i[0, :7].tolist()) == list(range(7))


def test_dense_topk_approx_reasonable(rng):
    emb = rng.standard_normal((512, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    s, i = dense_topk_approx(jnp.asarray(emb), jnp.asarray(q), 10)
    _, oi = oracle_topk(emb, q, 10, "cosine")
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(oi[r])) / 10 for r in range(4)
    ])
    assert overlap >= 0.7  # recall_target=0.95 nominal; generous floor


def test_merge_topk():
    a_s = jnp.asarray([[5.0, 3.0]])
    a_i = jnp.asarray([[10, 11]], dtype=jnp.int32)
    b_s = jnp.asarray([[4.0, 6.0]])
    b_i = jnp.asarray([[20, 21]], dtype=jnp.int32)
    s, i = merge_topk(a_s, a_i, b_s, b_i, 3)
    assert np.asarray(s).tolist() == [[6.0, 5.0, 4.0]]
    assert np.asarray(i).tolist() == [[21, 10, 20]]


def test_l2_normalize_zero_row():
    x = jnp.zeros((2, 4))
    out = np.asarray(l2_normalize(x))
    assert np.isfinite(out).all()
