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
