"""Multi-host (DCN) pod search: hybrid mesh + hierarchical top-k merge.

BACKLOG #9.  Single-host sharding (sharded_search.py) runs one flat
``shard`` axis over ICI.  A multi-host pod adds a second, much slower
interconnect — DCN between hosts — so the idiomatic layout is a hybrid
mesh with an explicit ``dcn`` axis (one entry per host) and the merge
becomes hierarchical: merge within the host over ICI first, then send
only the k per-host survivors across DCN.  Per query, DCN carries
``hosts * k * 8`` bytes instead of ``devices * k * 8`` — an
``ici_size``-fold reduction in cross-host traffic.

Launch (one process per host):

    JAX_COORDINATOR=host0:1234 NPROC=4 PROC_ID=$i python serve.py
    # inside: advanced_rag_tpu.parallel.distributed_init()
    #         mesh = build_pod_mesh()

The same programs run single-host by building the pod mesh with
``dcn=1`` (and in tests on the virtual 8-device CPU mesh with
``dcn=2, shard=2, data=2``), so one code path covers laptop to pod —
the reference's Milvus `num_shards` (indexing.py:234-239) never spans
machines without a whole extra Milvus cluster tier.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dense import dense_topk, l2_normalize
from .topk import gather_merge_topk

POD_AXES = ("dcn", "shard", "data")


def distributed_init() -> None:
    """Initialize multi-process JAX from env (no-op if single-process).

    Env: ``JAX_COORDINATOR`` (host:port), ``NPROC``, ``PROC_ID`` —
    thin wrapper over ``jax.distributed.initialize`` so service entry
    points stay declarative."""
    coord = os.environ.get("JAX_COORDINATOR")
    if not coord:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NPROC"]),
            process_id=int(os.environ["PROC_ID"]),
        )
    except RuntimeError as exc:
        # idempotent: entry points (service, launcher, tests) may have
        # initialized already — "must be called before any JAX calls"
        # when the caller did so deliberately, or "only be called once"
        if jax.process_count() < int(os.environ["NPROC"]):
            raise
        import logging

        logging.getLogger(__name__).info(
            "distributed already initialized (%s)", exc)


def build_pod_mesh(
    dcn: int = 0,
    shard: int = 0,
    data: int = 1,
) -> Mesh:
    """(dcn, shard, data) mesh.

    Multi-process: dcn = process count and each host's local devices
    fill (shard, data), placed via ``mesh_utils.create_hybrid_device_mesh``
    so the dcn axis really crosses hosts.  Single-process (incl. the
    virtual CPU mesh): a reshape with the requested axis sizes — the
    collectives are identical, only the wire under them differs.
    """
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        dcn = dcn or jax.process_count()
        local = jax.local_device_count()
        shard = shard or local // data
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                (1, shard, data), (dcn, 1, 1))
        except ValueError:
            # non-TPU multi-controller (e.g. the 2-process Gloo CPU
            # test): devices carry no slice attribute, so group the
            # dcn axis by process_index directly — same placement a
            # hybrid mesh gives on a pod (one dcn entry per host)
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            devices = np.asarray(devs).reshape(dcn, shard, data)
        return Mesh(devices, POD_AXES)
    n = len(jax.devices())
    dcn = dcn or 1
    shard = shard or n // (dcn * data)
    if dcn * shard * data != n:
        raise ValueError(
            f"pod mesh ({dcn}, {shard}, {data}) does not cover {n} devices")
    arr = np.asarray(jax.devices()).reshape(dcn, shard, data)
    return Mesh(arr, POD_AXES)


def hierarchical_merge_topk(
    scores: jnp.ndarray,   # [Q, k] local top-k
    ids: jnp.ndarray,      # [Q, k] local top-k GLOBAL ids
    k: int,
    dcn_axis: str = "dcn",
    ici_axis: str = "shard",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ICI merge first, then DCN: only k per-host survivors cross hosts.
    Result replicated over both axes (same contract as gather_merge)."""
    s, i = gather_merge_topk(scores, ids, k, ici_axis)
    return gather_merge_topk(s, i, k, dcn_axis)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_size", "normalize_queries",
                     "mesh", "dcn_axis", "shard_axis", "data_axis"),
)
def pod_dense_topk(
    emb: jnp.ndarray,        # [N, D] rows sharded over (dcn, shard)
    queries: jnp.ndarray,    # [Q, D] sharded over `data`
    k: int,
    valid: Optional[jnp.ndarray],   # [N] rows sharded over (dcn, shard)
    *,
    mesh: Mesh,
    metric: str = "ip",
    block_size: int = 65536,
    normalize_queries: bool = False,
    dcn_axis: str = "dcn",
    shard_axis: str = "shard",
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact masked dense top-k over a pod-sharded corpus.

    Same contract as ``sharded_dense_topk``; rows split over BOTH the
    host (dcn) and intra-host (shard) axes, merge hierarchical.
    """
    n = emb.shape[0]
    n_dcn = mesh.shape[dcn_axis]
    n_shard = mesh.shape[shard_axis]
    total = n_dcn * n_shard
    if n % total:
        raise ValueError(f"corpus rows {n} not divisible by {total}")
    local_n = n // total
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    q = queries.astype(jnp.float32)
    if normalize_queries:
        q = l2_normalize(q)

    def local(emb_l, q_l, valid_l):
        s, i = dense_topk(
            emb_l, q_l, k, valid_l,
            metric=metric, block_size=min(block_size, local_n),
            normalize_queries=False,
        )
        host = lax.axis_index(dcn_axis).astype(jnp.int32)
        chip = lax.axis_index(shard_axis).astype(jnp.int32)
        offset = (host * n_shard + chip) * local_n
        gids = jnp.where(i >= 0, i + offset, -1)
        return hierarchical_merge_topk(s, gids, k, dcn_axis, shard_axis)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P((dcn_axis, shard_axis), None), P(data_axis, None),
                  P((dcn_axis, shard_axis))),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        check_vma=False,
    )(emb, q, valid)


__all__ = [
    "POD_AXES",
    "build_pod_mesh",
    "distributed_init",
    "hierarchical_merge_topk",
    "pod_dense_topk",
]
