"""Sharded search programs: shard_map over the corpus axis + ICI merge.

The TPU-native replacement for Milvus `num_shards` (reference
indexing.py:234-239): the corpus lives row-sharded across the mesh's
``shard`` axis via `NamedSharding`; search runs the SAME single-device
programs (ops/dense.py, ops/sparse.py) per shard inside `shard_map`,
converts local rows to global ids, and merges top-k over ICI
(parallel/topk.py).  One jitted program end to end — XLA overlaps the
per-shard scan with the collective epilogue.

Multi-host pods run the identical program: the mesh simply spans hosts
and the gather rides DCN for the cross-host hops.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.dense import dense_topk, l2_normalize
from ..ops.sparse import sparse_topk
from .topk import gather_merge_topk, tree_merge_topk

#: Above this many shard-axis devices the log-tree merge beats the
#: one-shot all-gather (payload S*k grows past a few MB of ICI traffic).
TREE_MERGE_MIN_SHARDS = 32


def _merge(scores, ids, k, axis_name, num_shards):
    if num_shards >= TREE_MERGE_MIN_SHARDS and not (num_shards & (num_shards - 1)):
        return tree_merge_topk(scores, ids, k, axis_name, num_shards)
    return gather_merge_topk(scores, ids, k, axis_name)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_size", "normalize_queries", "mesh",
                     "shard_axis", "data_axis"),
)
def sharded_dense_topk(
    emb: jnp.ndarray,        # [N, D] row-sharded over `shard` (N % S == 0)
    queries: jnp.ndarray,    # [Q, D] sharded over `data` (Q % data size == 0)
    k: int,
    valid: Optional[jnp.ndarray],   # [N] bool, row-sharded (None -> all valid)
    emb_scale: Optional[jnp.ndarray] = None,  # [N] f32, row-sharded (SQ8)
    *,
    mesh: Mesh,
    metric: str = "ip",
    block_size: int = 65536,
    normalize_queries: bool = False,
    shard_axis: str = "shard",
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact masked dense top-k over a sharded corpus.

    Returns ``(scores [Q, k], global_ids [Q, k])`` sharded over `data`,
    replicated over `shard`.  Global ids are row positions in the
    unsharded [N, D] layout.  Masked/absent -> (NEG_INF, -1), identical
    contract to ``ops.dense.dense_topk``.

    SQ8 tier: pass int8 ``emb`` + row-sharded ``emb_scale`` — each shard
    scores its codes on the MXU in int8 (ops/quant.py), so a v5e-8 pod
    holds ~240M rows at D=384.
    """
    n = emb.shape[0]
    num_shards = mesh.shape[shard_axis]
    if n % num_shards:
        raise ValueError(f"corpus rows {n} not divisible by {num_shards} shards")
    local_n = n // num_shards
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    q = queries.astype(jnp.float32)
    if normalize_queries:
        q = l2_normalize(q)
    sq8 = emb_scale is not None

    def local(emb_l, q_l, valid_l, scale_l):
        if sq8:
            from ..ops.quant import dense_topk_sq8

            s, i = dense_topk_sq8(
                emb_l, scale_l, q_l, k, valid_l,
                metric="ip", block_size=min(block_size, local_n),
                normalize_queries=False,
            )
        else:
            s, i = dense_topk(
                emb_l, q_l, k, valid_l,
                metric=metric, block_size=min(block_size, local_n),
                normalize_queries=False,
            )
        offset = lax.axis_index(shard_axis).astype(jnp.int32) * local_n
        gids = jnp.where(i >= 0, i + offset, -1)
        return _merge(s, gids, k, shard_axis, num_shards)

    if emb_scale is None:  # shard_map needs a concrete arg; zeros, unused
        emb_scale = jnp.zeros((n,), jnp.float32)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(shard_axis, None), P(data_axis, None), P(shard_axis),
                  P(shard_axis)),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        check_vma=False,
    )(emb, q, valid, emb_scale)


@functools.partial(
    jax.jit,
    static_argnames=("k", "scoring", "k1", "b", "block_size", "mesh",
                     "shard_axis", "data_axis"),
)
def sharded_sparse_topk(
    doc_idx: jnp.ndarray,   # [N, P] row-sharded
    doc_tf: jnp.ndarray,    # [N, P] row-sharded
    doc_len: jnp.ndarray,   # [N] row-sharded
    df: jnp.ndarray,        # [V] REPLICATED document frequencies (global)
    n_docs: jnp.ndarray,    # scalar: global live corpus size
    q_idx: jnp.ndarray,     # [Q, T] sharded over `data`
    q_tf: jnp.ndarray,      # [Q, T] sharded over `data`
    k: int,
    valid: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    scoring: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 8192,
    shard_axis: str = "shard",
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded BM25/IP top-k; scores are bit-identical to the
    single-device program because idf uses the global df/n_docs and the
    average doc length is psum'd across shards before weighting."""
    n = doc_idx.shape[0]
    num_shards = mesh.shape[shard_axis]
    if n % num_shards:
        raise ValueError(f"corpus rows {n} not divisible by {num_shards} shards")
    local_n = n // num_shards
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)

    def local(idx_l, tf_l, len_l, df_r, nd, qi, qt, valid_l):
        v = valid_l.astype(jnp.float32)
        len_sum = lax.psum(jnp.sum(len_l.astype(jnp.float32) * v), shard_axis)
        cnt = lax.psum(jnp.sum(v), shard_axis)
        avg_len = len_sum / jnp.maximum(cnt, 1.0)
        s, i = sparse_topk(
            idx_l, tf_l, len_l, df_r, nd, qi, qt, k, valid_l, avg_len,
            scoring=scoring, k1=k1, b=b,
            block_size=min(block_size, local_n),
        )
        offset = lax.axis_index(shard_axis).astype(jnp.int32) * local_n
        gids = jnp.where(i >= 0, i + offset, -1)
        return _merge(s, gids, k, shard_axis, num_shards)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(shard_axis, None), P(shard_axis, None), P(shard_axis),
            P(None), P(),
            P(data_axis, None), P(data_axis, None), P(shard_axis),
        ),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        check_vma=False,
    )(doc_idx, doc_tf, doc_len, df, n_docs, q_idx, q_tf, valid)


def shard_corpus_arrays(mesh: Mesh, *arrays, shard_axis: str = "shard"):
    """Place row-aligned corpus arrays with row sharding (pad first with
    ``parallel.mesh.pad_to_shards``; padded rows must be invalid)."""
    out = []
    for arr in arrays:
        spec = P(shard_axis, *([None] * (arr.ndim - 1)))
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


__all__ = [
    "sharded_dense_topk",
    "sharded_sparse_topk",
    "shard_corpus_arrays",
    "TREE_MERGE_MIN_SHARDS",
]
