"""Sharded partitioned ANN: per-shard IVF / IVF-PQ over the mesh.

The reference's scale story is Milvus `num_shards` + HNSW per shard
(indexing.py:234-239); the single-chip equivalents here are
ops/ivf.py (packed float/SQ8 partitions) and ops/ivfpq.py (residual
codes).  This module runs those same structures per mesh shard:

- **Build**: the corpus row axis is split S ways; each shard trains its
  OWN coarse quantizer over its rows (locality — no global k-means
  sync needed), and the per-shard structures are stacked on a leading
  shard axis and placed with `NamedSharding(P("shard"))`, so shard s's
  partitions live in shard s's HBM.
- **Search**: one `shard_map` program — each shard probes its local
  partitions (`ivf_topk` / `ivfpq_topk` run verbatim inside the mapped
  function), translates local rows to global ids, and the per-shard
  top-k merge rides ICI (only k ids+scores cross links, log-tree
  beyond 32 shards — parallel/topk.py).

All shards share static shapes: nlist/cap/tail sizes are padded to the
max across shards at build time (pad slots carry row id -1 and are
masked exactly like single-chip pads).

Streaming appends: rebuild per shard (build cost is already S-way
parallel in wall-clock terms on a pod); the single-chip streaming-tail
machinery stays the answer below pod scale.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ivf import IVFPartitions, build_ivf, ivf_topk
from ..ops.ivfpq import IVFPQIndex, build_ivfpq, ivfpq_topk
from .sharded_search import _merge


def _stack_put(mesh: Mesh, shard_axis: str, arrays) -> jnp.ndarray:
    """np stack on a new leading shard axis -> device_put row-sharded."""
    stacked = np.stack(arrays)
    spec = P(shard_axis, *([None] * (stacked.ndim - 1)))
    return jax.device_put(stacked, NamedSharding(mesh, spec))


def build_sharded_ivf(
    emb_host: np.ndarray,        # [N, D] f32 (pre-normalized), N % S == 0
    mesh: Mesh,
    *,
    nlist: int = 0,
    dtype: str = "bfloat16",
    shard_axis: str = "shard",
    **build_kw,
) -> IVFPartitions:
    """Per-shard IVF builds stacked to [S, ...] sharded arrays."""
    s_count = mesh.shape[shard_axis]
    n = emb_host.shape[0]
    if n % s_count:
        raise ValueError(f"corpus rows {n} not divisible by {s_count}")
    local_n = n // s_count
    if not nlist:
        from ..ops.ivf import auto_nlist

        nlist = auto_nlist(local_n)
    parts = [build_ivf(emb_host[s * local_n:(s + 1) * local_n], nlist,
                       dtype=dtype, **build_kw)
             for s in range(s_count)]
    cap = max(int(p.packed_emb.shape[1]) for p in parts)
    t_cap = max(int(p.tail_emb.shape[0]) for p in parts)

    def pad_part(p: IVFPartitions) -> IVFPartitions:
        c_pad = cap - p.packed_emb.shape[1]
        t_pad = t_cap - p.tail_emb.shape[0]
        return IVFPartitions(
            centroids=np.asarray(p.centroids),
            packed_emb=np.pad(np.asarray(p.packed_emb),
                              ((0, 0), (0, c_pad), (0, 0))),
            packed_rows=np.pad(np.asarray(p.packed_rows),
                               ((0, 0), (0, c_pad)), constant_values=-1),
            tail_emb=np.pad(np.asarray(p.tail_emb),
                            ((0, t_pad), (0, 0))),
            tail_rows=np.pad(np.asarray(p.tail_rows), (0, t_pad),
                             constant_values=-1),
            packed_scale=(np.pad(np.asarray(p.packed_scale),
                                 ((0, 0), (0, c_pad)))
                          if p.packed_scale is not None else None),
            tail_scale=(np.pad(np.asarray(p.tail_scale), (0, t_pad))
                        if p.tail_scale is not None else None),
        )

    padded = [pad_part(p) for p in parts]
    sq8 = padded[0].packed_scale is not None
    return IVFPartitions(
        centroids=_stack_put(mesh, shard_axis, [p.centroids for p in padded]),
        packed_emb=_stack_put(mesh, shard_axis,
                              [p.packed_emb for p in padded]),
        packed_rows=_stack_put(mesh, shard_axis,
                               [p.packed_rows for p in padded]),
        tail_emb=_stack_put(mesh, shard_axis, [p.tail_emb for p in padded]),
        tail_rows=_stack_put(mesh, shard_axis,
                             [p.tail_rows for p in padded]),
        packed_scale=(_stack_put(mesh, shard_axis,
                                 [p.packed_scale for p in padded])
                      if sq8 else None),
        tail_scale=(_stack_put(mesh, shard_axis,
                               [p.tail_scale for p in padded])
                    if sq8 else None),
    )


def build_sharded_ivfpq(
    emb_host: np.ndarray,        # [N, D] f32 (pre-normalized), N % S == 0
    mesh: Mesh,
    *,
    nlist: int = 0,
    m: int = 0,
    bits: int = 4,
    shard_axis: str = "shard",
    **build_kw,
) -> IVFPQIndex:
    """Per-shard residual IVF-PQ builds stacked to [S, ...] sharded."""
    s_count = mesh.shape[shard_axis]
    n = emb_host.shape[0]
    if n % s_count:
        raise ValueError(f"corpus rows {n} not divisible by {s_count}")
    local_n = n // s_count
    if not nlist:
        from ..ops.ivf import auto_nlist

        nlist = auto_nlist(local_n)
    idxs = [build_ivfpq(emb_host[s * local_n:(s + 1) * local_n], nlist,
                        m=m, bits=bits, **build_kw)
            for s in range(s_count)]
    cap = max(int(i.packed_codes.shape[1]) for i in idxs)
    t_cap = max(int(i.tail_codes.shape[0]) for i in idxs)

    def pad_idx(i: IVFPQIndex) -> IVFPQIndex:
        c_pad = cap - i.packed_codes.shape[1]
        t_pad = t_cap - i.tail_codes.shape[0]
        return IVFPQIndex(
            centroids=np.asarray(i.centroids),
            codebooks=np.asarray(i.codebooks),
            packed_codes=np.pad(np.asarray(i.packed_codes),
                                ((0, 0), (0, c_pad), (0, 0))),
            packed_rows=np.pad(np.asarray(i.packed_rows),
                               ((0, 0), (0, c_pad)), constant_values=-1),
            tail_codes=np.pad(np.asarray(i.tail_codes),
                              ((0, t_pad), (0, 0))),
            tail_rows=np.pad(np.asarray(i.tail_rows), (0, t_pad),
                             constant_values=-1),
            tail_assign=np.pad(np.asarray(i.tail_assign), (0, t_pad)),
        )

    padded = [pad_idx(i) for i in idxs]
    return IVFPQIndex(
        centroids=_stack_put(mesh, shard_axis,
                             [i.centroids for i in padded]),
        codebooks=_stack_put(mesh, shard_axis,
                             [i.codebooks for i in padded]),
        packed_codes=_stack_put(mesh, shard_axis,
                                [i.packed_codes for i in padded]),
        packed_rows=_stack_put(mesh, shard_axis,
                               [i.packed_rows for i in padded]),
        tail_codes=_stack_put(mesh, shard_axis,
                              [i.tail_codes for i in padded]),
        tail_rows=_stack_put(mesh, shard_axis,
                             [i.tail_rows for i in padded]),
        tail_assign=_stack_put(mesh, shard_axis,
                               [i.tail_assign for i in padded]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "mesh", "shard_axis"),
)
def sharded_ivf_topk(
    parts: IVFPartitions,                 # stacked [S, ...] sharded
    queries: jnp.ndarray,                 # [Q, D] replicated, normalized
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N] row-sharded
    *,
    mesh: Mesh,
    nprobe: int = 32,
    shard_axis: str = "shard",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores [Q, k], GLOBAL row ids [Q, k]), replicated."""
    num_shards = mesh.shape[shard_axis]
    sq8 = parts.packed_scale is not None

    def local(cent, pe, pr, te, tr, psc, tsc, valid_l, q):
        shard = lax.axis_index(shard_axis).astype(jnp.int32)
        p = IVFPartitions(
            centroids=cent[0], packed_emb=pe[0], packed_rows=pr[0],
            tail_emb=te[0], tail_rows=tr[0],
            packed_scale=psc[0] if sq8 else None,
            tail_scale=tsc[0] if sq8 else None,
        )
        s, i = ivf_topk(p, q, k, valid_l, nprobe=nprobe)
        offset = shard * valid_l.shape[0]
        gi = jnp.where(i >= 0, i + offset, -1)
        return _merge(s, gi, k, shard_axis, num_shards)

    if valid is None:
        raise ValueError(
            "sharded_ivf_topk requires the row-sharded valid mask (it "
            "also carries the per-shard row count for id translation)")
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(shard_axis), P(shard_axis), P(shard_axis),
            P(shard_axis), P(shard_axis),
            P(shard_axis), P(shard_axis),
            P(shard_axis), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(parts.centroids, parts.packed_emb, parts.packed_rows,
      parts.tail_emb, parts.tail_rows,
      parts.packed_scale if sq8 else parts.centroids,
      parts.tail_scale if sq8 else parts.centroids,
      valid, queries)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "m", "bits", "mesh", "shard_axis"),
)
def sharded_ivfpq_topk(
    idx: IVFPQIndex,                      # stacked [S, ...] sharded
    queries: jnp.ndarray,                 # [Q, D] replicated, normalized
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N] row-sharded (required)
    *,
    mesh: Mesh,
    nprobe: int = 32,
    m: int,
    bits: int,
    shard_axis: str = "shard",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores [Q, k], GLOBAL row ids [Q, k]), replicated."""
    num_shards = mesh.shape[shard_axis]
    if valid is None:
        raise ValueError("sharded_ivfpq_topk requires the row-sharded "
                         "valid mask")

    def local(cent, cbs, pc, pr, tc, tr, ta, valid_l, q):
        shard = lax.axis_index(shard_axis).astype(jnp.int32)
        li = IVFPQIndex(
            centroids=cent[0], codebooks=cbs[0], packed_codes=pc[0],
            packed_rows=pr[0], tail_codes=tc[0], tail_rows=tr[0],
            tail_assign=ta[0],
        )
        s, i = ivfpq_topk(li, q, k, valid_l, nprobe=nprobe, m=m, bits=bits)
        offset = shard * valid_l.shape[0]
        gi = jnp.where(i >= 0, i + offset, -1)
        return _merge(s, gi, k, shard_axis, num_shards)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(shard_axis), P(shard_axis), P(shard_axis), P(shard_axis),
            P(shard_axis), P(shard_axis), P(shard_axis),
            P(shard_axis), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(idx.centroids, idx.codebooks, idx.packed_codes, idx.packed_rows,
      idx.tail_codes, idx.tail_rows, idx.tail_assign, valid, queries)


__all__ = [
    "build_sharded_ivf",
    "build_sharded_ivfpq",
    "sharded_ivf_topk",
    "sharded_ivfpq_topk",
]
