"""Pod-mesh (DCN x ICI) search on the virtual 8-device mesh.

Exercises the hybrid (dcn, shard, data) layout and the hierarchical
merge — the multi-host story the reference cannot test at all (its
sharding lives inside a Milvus cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from advanced_rag_tpu.ops.dense import dense_topk
from advanced_rag_tpu.parallel import build_pod_mesh, pod_dense_topk


@pytest.fixture(scope="module")
def pod_mesh():
    return build_pod_mesh(dcn=2, shard=2, data=2)  # 2x2x2 = 8 virtual devices


def _place(mesh, arr, spec):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))


def test_pod_mesh_axes(pod_mesh):
    assert pod_mesh.shape == {"dcn": 2, "shard": 2, "data": 2}


def test_pod_dense_matches_unsharded(pod_mesh, rng):
    n, d, q_n, k = 1024, 32, 4, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, q_n)]

    ref_s, ref_i = dense_topk(jnp.asarray(emb), jnp.asarray(q), k,
                              metric="ip", normalize_queries=False)

    emb_sh = _place(pod_mesh, emb, P(("dcn", "shard"), None))
    q_sh = _place(pod_mesh, q, P("data", None))
    s, i = pod_dense_topk(emb_sh, q_sh, k, None, mesh=pod_mesh, metric="ip")
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(np.asarray(i), np.asarray(ref_i)):
        assert len(set(a.tolist()) & set(b.tolist())) >= k - 1  # tie order


def test_pod_dense_respects_mask(pod_mesh, rng):
    n, d = 512, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:32] = True  # only rows on host 0 / first chip live
    q = rng.standard_normal((2, d)).astype(np.float32)
    emb_sh = _place(pod_mesh, emb, P(("dcn", "shard"), None))
    v_sh = _place(pod_mesh, valid, P(("dcn", "shard")))
    q_sh = _place(pod_mesh, q, P("data", None))
    s, i = pod_dense_topk(emb_sh, q_sh, 8, v_sh, mesh=pod_mesh, metric="ip")
    i = np.asarray(i)
    assert set(i[i >= 0].tolist()) <= set(range(32))


def test_single_host_degenerate():
    mesh = build_pod_mesh(dcn=1, shard=8, data=1)
    assert mesh.shape == {"dcn": 1, "shard": 8, "data": 1}
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((256, 8)).astype(np.float32)
    q = emb[:1]
    emb_sh = _place(mesh, emb, P(("dcn", "shard"), None))
    s, i = pod_dense_topk(emb_sh, jnp.asarray(q), 5, None, mesh=mesh,
                          metric="ip")
    assert int(np.asarray(i)[0, 0]) == 0  # self-match


def test_bad_pod_shape_rejected():
    with pytest.raises(ValueError):
        build_pod_mesh(dcn=3, shard=2, data=1)


class TestProcessEnvPaths:
    """Multi-process entry paths, driven without real pod hardware."""

    def test_distributed_init_noop_without_env(self, monkeypatch):
        from advanced_rag_tpu.parallel import multihost

        monkeypatch.delenv("JAX_COORDINATOR", raising=False)
        called = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.update(kw))
        multihost.distributed_init()
        assert called == {}

    def test_distributed_init_reads_env(self, monkeypatch):
        from advanced_rag_tpu.parallel import multihost

        monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:8476")
        monkeypatch.setenv("NPROC", "2")
        monkeypatch.setenv("PROC_ID", "1")
        called = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.update(kw))
        multihost.distributed_init()
        assert called == {"coordinator_address": "10.0.0.1:8476",
                          "num_processes": 2, "process_id": 1}

    def test_pod_mesh_multiprocess_branch(self, monkeypatch):
        """process_count>1 routes through create_hybrid_device_mesh with
        dcn = process count; stub the hybrid placement (it requires a
        real multi-host fabric) and check the axis wiring."""
        from jax.experimental import mesh_utils

        from advanced_rag_tpu.parallel import multihost

        seen = {}

        def fake_hybrid(per_host, dcn_shape):
            seen["per_host"], seen["dcn"] = per_host, dcn_shape
            return np.asarray(jax.devices()).reshape(2, 2, 2)

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "local_device_count", lambda: 4)
        monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh",
                            fake_hybrid)
        mesh = multihost.build_pod_mesh(data=2)
        assert seen == {"per_host": (1, 2, 2), "dcn": (2, 1, 1)}
        assert mesh.axis_names == ("dcn", "shard", "data")
