"""Sharded one-dispatch hybrid retrieval: the pod-scale query program.

Extends the single-chip fused program (ops/hybrid.py) across the mesh's
corpus-shard axis: per-shard masked dense + BM25 top-k, ICI top-k merge
(only k ids+scores cross links), replicated RRF fusion, then MMR whose
candidate embeddings are assembled with ONE psum (each shard contributes
the rows it owns).  Everything still compiles into a single program;
this is the TPU-native replacement for "Milvus locality-aware sharding"
plus its coordinator-side reduce (SURVEY.md §2d item 4, §5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dense import NEG_INF, dense_topk
from ..ops.fusion import mmr_select, rrf_fuse
from ..ops.sparse import sparse_topk
from .sharded_search import _merge


@functools.partial(
    jax.jit,
    static_argnames=("k_cand", "k_out", "metric", "scoring", "rrf_k",
                     "use_mmr", "dense_block_size", "sparse_block_size",
                     "mesh", "shard_axis", "dense_impl", "pq_m", "pq_bits",
                     "pq_impl", "dense_depth", "nprobe"),
)
def sharded_hybrid_retrieve(
    emb: jnp.ndarray,        # [N, D] row-sharded (N % S == 0); PQ codes
    doc_idx: jnp.ndarray,    # [N, P] row-sharded        [N, m] for "pq"
    doc_tf: jnp.ndarray,     # [N, P] row-sharded
    doc_len: jnp.ndarray,    # [N] row-sharded
    df: jnp.ndarray,         # [V] replicated
    n_docs: jnp.ndarray,     # scalar (global)
    q_dense: jnp.ndarray,    # [Q, D] replicated (normalized upstream)
    q_idx: jnp.ndarray,      # [Q, T] replicated
    q_tf: jnp.ndarray,       # [Q, T] replicated
    valid: Optional[jnp.ndarray],   # [N] row-sharded
    weights: jnp.ndarray,    # [2] f32
    mmr_lambda: jnp.ndarray,
    pq_codebooks: Optional[jnp.ndarray] = None,  # [m, c, dsub] replicated
    emb_scale: Optional[jnp.ndarray] = None,     # [N] f32 row-sharded (sq8)
    # stacked per-shard partitioned structures for dense_impl="ivfpq"
    # (build_sharded_ivfpq) / "ivf" (build_sharded_ivf); with ivfpq,
    # emb holds row-sharded FLAT pq codes used only for the MMR decode
    ivfpq_idx=None,                              # parallel IVFPQIndex
    ivf_parts=None,                              # parallel IVFPartitions
    *,
    mesh: Mesh,
    k_cand: int,
    k_out: int,
    metric: str = "ip",
    scoring: str = "bm25",
    rrf_k: int = 60,
    use_mmr: bool = True,
    dense_block_size: int = 65536,
    sparse_block_size: int = 8192,
    shard_axis: str = "shard",
    dense_impl: str = "scan",    # scan | sq8 | pq | ivf | ivfpq
    nprobe: int = 32,            # partitioned probes (dense_impl="ivfpq")
    pq_m: int = 0,
    pq_bits: int = 4,
    pq_impl: str = "pallas",
    # dense over-retrieve depth (0 = k_cand): when > k_cand the return
    # grows deep global dense candidates for host exact refinement —
    # the sharded analogue of ops/hybrid.py dense_depth.
    dense_depth: int = 0,
):
    """-> (ids [Q, k_out], scores, method_counts)[, dense ids/scores at
    ``dense_depth``], all replicated.

    Contract identical to ops.hybrid.hybrid_retrieve run on the
    unsharded corpus (BM25 exact via global df + psum'd avg_len; RRF and
    MMR operate on globally-merged candidates).
    """
    n = emb.shape[0]
    num_shards = mesh.shape[shard_axis]
    if n % num_shards:
        raise ValueError(f"corpus rows {n} not divisible by {num_shards}")
    local_n = n // num_shards
    depth = max(dense_depth, k_cand)
    has_scale = emb_scale is not None   # sq8 codes in emb (flat or ivf)
    if dense_impl == "ivf" and ivf_parts is None:
        raise ValueError('dense_impl="ivf" requires ivf_parts '
                         '(build_sharded_ivf)')
    if dense_impl == "ivfpq" and ivfpq_idx is None:
        raise ValueError('dense_impl="ivfpq" requires ivfpq_idx '
                         '(build_sharded_ivfpq)')
    # explicit tier flag — NOT inferred from the filtered leaf count,
    # which would silently mis-bind fields if IVFPartitions ever grows
    # another optional array
    ivf_sq8 = ivf_parts is not None and ivf_parts.packed_scale is not None
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)

    def local(emb_l, idx_l, tf_l, len_l, df_r, nd, q, qi, qt, valid_l, w,
              lam, cbs, scale_l, pidx, pivf):
        shard = lax.axis_index(shard_axis).astype(jnp.int32)
        offset = shard * local_n
        kk = min(depth, local_n)

        def pad_depth(d_s, d_i):
            if kk < depth:
                d_s = jnp.pad(d_s, ((0, 0), (0, depth - kk)),
                              constant_values=float(NEG_INF))
                d_i = jnp.pad(d_i, ((0, 0), (0, depth - kk)),
                              constant_values=-1)
            return d_s, d_i

        if dense_impl == "ivf":
            # per-shard packed float/SQ8 partitions (build_sharded_ivf)
            from ..ops.ivf import IVFPartitions, ivf_topk

            lp = IVFPartitions(
                *(leaf[0] for leaf in pivf[:5]),
                packed_scale=pivf[5][0] if ivf_sq8 else None,
                tail_scale=pivf[6][0] if ivf_sq8 else None,
            )
            d_s, d_i = ivf_topk(lp, q, kk, valid_l, nprobe=nprobe)
            d_s, d_i = pad_depth(d_s, d_i)
        elif dense_impl == "ivfpq":
            # per-shard residual partitions (build_sharded_ivfpq):
            # nprobe-bounded candidate generation; flat codes in emb_l
            # serve only the MMR decode below
            from ..ops.ivfpq import IVFPQIndex, ivfpq_topk

            li = IVFPQIndex(*(leaf[0] for leaf in pidx))
            d_s, d_i = ivfpq_topk(
                li, q, kk, valid_l, nprobe=nprobe,
                m=int(li.codebooks.shape[0]), bits=pq_bits)
            d_s, d_i = pad_depth(d_s, d_i)
        elif dense_impl == "pq":
            from ..ops.pq import pq_topk

            d_s, d_i = pq_topk(
                cbs, emb_l, q, kk, valid_l,
                m=pq_m, bits=pq_bits, impl=pq_impl)
            d_s, d_i = pad_depth(d_s, d_i)
        elif dense_impl == "sq8":
            from ..ops.quant import dense_topk_sq8

            d_s, d_i = dense_topk_sq8(
                emb_l, scale_l, q, kk, valid_l,
                metric="ip", normalize_queries=False)
            d_s, d_i = pad_depth(d_s, d_i)
        else:
            d_s, d_i = dense_topk(
                emb_l, q, depth, valid_l, metric=metric,
                block_size=min(dense_block_size, local_n),
                normalize_queries=False,
            )
        d_s, d_gi = _merge(d_s, jnp.where(d_i >= 0, d_i + offset, -1),
                           depth, shard_axis, num_shards)

        v = valid_l.astype(jnp.float32)
        len_sum = lax.psum(jnp.sum(len_l.astype(jnp.float32) * v), shard_axis)
        cnt = lax.psum(jnp.sum(v), shard_axis)
        avg_len = len_sum / jnp.maximum(cnt, 1.0)
        s_s, s_i = sparse_topk(
            idx_l, tf_l, len_l, df_r, nd, qi, qt, k_cand, valid_l, avg_len,
            scoring=scoring, block_size=min(sparse_block_size, local_n),
        )
        s_s, s_gi = _merge(s_s, jnp.where(s_i >= 0, s_i + offset, -1),
                           k_cand, shard_axis, num_shards)

        fused_s, fused_i, counts = rrf_fuse(
            jnp.stack([d_gi[:, :k_cand], s_gi]), w, rrf_k=rrf_k,
            k_out=k_cand)

        if not use_mmr:
            return (fused_i[:, :k_out], fused_s[:, :k_out],
                    counts[:, :k_out], d_gi, d_s)

        # Candidate embeddings: each shard contributes the rows it owns,
        # one psum assembles the [Q, k_cand, D] pool (k_cand*D floats per
        # link — tiny).
        local_rows = fused_i - offset
        own = (local_rows >= 0) & (local_rows < local_n) & (fused_i >= 0)
        safe = jnp.clip(local_rows, 0, local_n - 1)
        if dense_impl in ("pq", "ivfpq"):
            from ..ops.pq import PQCodebook, pq_decode

            ce = pq_decode(
                PQCodebook(codebooks=cbs, m=pq_m, bits=pq_bits),
                emb_l[safe])                              # [Q, k_cand, D]
        else:
            ce = emb_l[safe].astype(jnp.float32)          # [Q, k_cand, D]
            if has_scale:                                 # dequantize sq8
                ce = ce * scale_l[safe][..., None]
        ce = jnp.where(own[:, :, None], ce, 0.0)
        ce = lax.psum(ce, shard_axis)
        ok = fused_i >= 0

        def per_query(c, rel, okq):
            return mmr_select(c, rel, k_out, lam, okq)

        pos = jax.vmap(per_query)(ce, fused_s, ok)
        sel_ok = pos >= 0
        sp = jnp.clip(pos, 0)
        out_i = jnp.where(sel_ok, jnp.take_along_axis(fused_i, sp, 1), -1)
        out_s = jnp.where(sel_ok, jnp.take_along_axis(fused_s, sp, 1), NEG_INF)
        out_c = jnp.where(sel_ok, jnp.take_along_axis(counts, sp, 1), 0)
        return out_i, out_s, out_c, d_gi, d_s

    if pq_codebooks is None:  # keep the pytree static for shard_map
        pq_codebooks = jnp.zeros((1, 1, 1), jnp.float32)
    if emb_scale is None:
        emb_scale = jnp.zeros((n,), jnp.float32)
    if ivfpq_idx is None:
        pidx_arg: tuple = ()
        pidx_spec: tuple = ()
    else:
        pidx_arg = tuple(ivfpq_idx)           # NamedTuple -> leaf tuple
        pidx_spec = tuple(P(shard_axis) for _ in pidx_arg)
    if ivf_parts is None:
        pivf_arg: tuple = ()
        pivf_spec: tuple = ()
    else:
        pivf_arg = tuple(a for a in ivf_parts if a is not None)
        pivf_spec = tuple(P(shard_axis) for _ in pivf_arg)
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(shard_axis, None), P(shard_axis, None), P(shard_axis, None),
            P(shard_axis), P(None), P(),
            P(None, None), P(None, None), P(None, None), P(shard_axis),
            P(None), P(), P(None, None, None), P(shard_axis), pidx_spec,
            pivf_spec,
        ),
        out_specs=(P(None, None), P(None, None), P(None, None),
                   P(None, None), P(None, None)),
        check_vma=False,
    )(emb, doc_idx, doc_tf, doc_len, df, n_docs,
      q_dense, q_idx, q_tf, valid, weights, mmr_lambda, pq_codebooks,
      emb_scale, pidx_arg, pivf_arg)
    if dense_depth > k_cand:
        return out
    return out[:3]


__all__ = ["sharded_hybrid_retrieve"]
