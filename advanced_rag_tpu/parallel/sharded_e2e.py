"""Sharded one-dispatch retrieve+rerank: the pod-scale e2e program.

Single-chip ops/e2e.py keeps embed -> hybrid -> rerank on one device.
At pod scale the corpus (and its token table) is row-sharded; this
module runs the same logical program across the mesh:

  1. query embedding — replicated BiEncoder forward (tiny);
  2. corpus search — `sharded_hybrid_retrieve` (per-shard fused hybrid
     + ICI top-k merge; only k ids/scores cross links);
  3. candidate token gather — one-hot psum over the row-sharded token
     table (payload: Q x K x Ld int32 per hop, a few KB);
  4. rerank — DATA-PARALLEL cross-encoder: the Q*K pairs split over the
     same mesh axis, each device scores its slice, all-gather of the
     [Q*K] scalars.  Search shards by corpus rows, rerank by pairs —
     both ride the one `shard` axis, so no resharding of weights.

Everything sits under one jit: XLA emits a single program whose
collectives ride ICI (SURVEY.md §2d item 4).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.e2e import E2EResult
from .sharded_hybrid import sharded_hybrid_retrieve


def sharded_token_gather(
    doc_tokens: jnp.ndarray,      # [N, Ld] row-sharded over shard_axis
    cand: jnp.ndarray,            # [Q, K] global row ids, replicated
    *,
    mesh: Mesh,
    shard_axis: str = "shard",
) -> jnp.ndarray:
    """-> [Q, K, Ld] candidate token rows (0 where cand < 0)."""
    n = doc_tokens.shape[0]
    n_shards = mesh.shape[shard_axis]
    rows_per_shard = n // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(shard_axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def gather(tok_local, cand_rep):
        # one-hot psum gather: exactly one shard owns each global row,
        # every other shard contributes zeros — the psum IS the gather
        idx = lax.axis_index(shard_axis)
        local = cand_rep - idx * rows_per_shard
        ok = (local >= 0) & (local < rows_per_shard) & (cand_rep >= 0)
        g = tok_local[jnp.clip(local, 0, rows_per_shard - 1)]
        g = jnp.where(ok[..., None], g.astype(jnp.int32), 0)
        return lax.psum(g, shard_axis)

    return gather(doc_tokens, cand.astype(jnp.int32))


def sharded_ce_scores(
    ce_model: Any,
    params_ce: Any,
    pair_ids: jnp.ndarray,        # [B, L] replicated (B = Q*K, padded)
    pair_mask: jnp.ndarray,
    pair_seg: jnp.ndarray,
    *,
    mesh: Mesh,
    shard_axis: str = "shard",
) -> jnp.ndarray:
    """Data-parallel pair scoring -> [B] f32 (replicated)."""
    n_shards = mesh.shape[shard_axis]
    b = pair_ids.shape[0]
    pad = (-b) % n_shards
    if pad:
        pair_ids = jnp.pad(pair_ids, ((0, pad), (0, 0)))
        pair_mask = jnp.pad(pair_mask, ((0, pad), (0, 0)))
        pair_seg = jnp.pad(pair_seg, ((0, pad), (0, 0)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(shard_axis, None), P(shard_axis, None),
                  P(shard_axis, None)),
        out_specs=P(shard_axis),
        check_vma=False,
    )
    def score(p, ids, mask, seg):
        return ce_model.apply(p, ids, mask, seg)

    return score(params_ce, pair_ids, pair_mask, pair_seg)[:b]


def make_sharded_retrieve_rerank(
    bi_model: Any,
    ce_model: Any,
    *,
    mesh: Mesh,
    k_cand: int = 40,
    k_out: int = 24,
    k_rerank: int = 16,
    k_final: int = 8,
    pad_id: int = 0,
    sep_id: int = 2,
    metric: str = "ip",
    dense_impl: str = "scan",
    use_mmr: bool = True,
    shard_axis: str = "shard",
    **hybrid_static: Any,
):
    """Build the jitted pod-scale program (mirrors ops/e2e.py)."""
    if k_rerank > k_out or k_final > k_rerank:
        raise ValueError("need k_final <= k_rerank <= k_out")

    def program(
        params_bi: Any,
        params_ce: Any,
        q_ids: jnp.ndarray,
        q_mask: jnp.ndarray,
        q_sp_idx: jnp.ndarray,
        q_sp_tf: jnp.ndarray,
        doc_tokens: jnp.ndarray,      # [N, Ld] row-sharded
        emb: jnp.ndarray,             # [N, D] row-sharded
        doc_idx: jnp.ndarray,
        doc_tf: jnp.ndarray,
        doc_len: jnp.ndarray,
        df: jnp.ndarray,
        n_docs: jnp.ndarray,
        valid: Optional[jnp.ndarray],
        weights: jnp.ndarray,
        mmr_lambda: jnp.ndarray,
        emb_scale: Optional[jnp.ndarray] = None,
    ) -> E2EResult:
        q_dense = bi_model.apply(params_bi, q_ids, q_mask)
        cand_i, cand_s, _counts = sharded_hybrid_retrieve(
            emb, doc_idx, doc_tf, doc_len, df, n_docs,
            q_dense, q_sp_idx, q_sp_tf, valid, weights, mmr_lambda,
            emb_scale=emb_scale,
            mesh=mesh, k_cand=k_cand, k_out=k_out, metric=metric,
            dense_impl=dense_impl, use_mmr=use_mmr,
            shard_axis=shard_axis, **hybrid_static)[:3]
        cand = cand_i[:, :k_rerank]
        cand_s = cand_s[:, :k_rerank]

        dtok = sharded_token_gather(doc_tokens, cand, mesh=mesh,
                                    shard_axis=shard_axis)   # [Q, K, Ld]

        Q, Lq = q_ids.shape
        K = cand.shape[1]
        Ld = dtok.shape[-1]
        qi = jnp.broadcast_to(q_ids[:, None, :], (Q, K, Lq))
        qm = jnp.broadcast_to(q_mask[:, None, :], (Q, K, Lq))
        dmask = (dtok != pad_id).astype(jnp.float32)
        sep = jnp.full((Q, K, 1), sep_id, jnp.int32)
        L = Lq + Ld + 1
        pair_ids = jnp.concatenate([qi, dtok, sep], -1).reshape(Q * K, L)
        pair_mask = jnp.concatenate(
            [qm, dmask, jnp.ones((Q, K, 1), jnp.float32)], -1
        ).reshape(Q * K, L)
        pair_seg = jnp.concatenate(
            [jnp.zeros((Q, K, Lq), jnp.int32),
             jnp.ones((Q, K, Ld + 1), jnp.int32)], -1).reshape(Q * K, L)

        ce = sharded_ce_scores(ce_model, params_ce, pair_ids, pair_mask,
                               pair_seg, mesh=mesh,
                               shard_axis=shard_axis).reshape(Q, K)
        ce = jnp.where(cand >= 0, ce, -jnp.inf)
        top_s, top_j = lax.top_k(ce, k_final)
        final_ids = jnp.take_along_axis(cand, top_j, axis=1)
        final_fused = jnp.take_along_axis(cand_s, top_j, axis=1)
        final_ids = jnp.where(jnp.isfinite(top_s), final_ids, -1)
        return E2EResult(final_ids, top_s, final_fused, cand, cand_s,
                         q_dense)

    return jax.jit(program)


__all__ = ["make_sharded_retrieve_rerank", "sharded_token_gather",
           "sharded_ce_scores"]
