"""On-device rank fusion and diversification.

Replaces the reference's CPU hot loops: weighted reciprocal-rank fusion
with dedup (reference retrieval.py:421-491, RRF k=60, weights dense 0.7 /
sparse 0.3 / domain 0.2) and MMR diversification (retrieval.py:493-516).
The reference computes MMR similarity as token Jaccard on Python strings;
here it is embedding cosine on the MXU (SURVEY.md §7 B3), which is both
faster and a better similarity.

Shapes are static: every method contributes exactly K (padded, id=-1)
candidates, so the whole hybrid fuse runs inside one jitted program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .dense import NEG_INF, l2_normalize


def _rrf_one_query(
    ids: jnp.ndarray,      # [M, K] i32, -1 = padding
    weights: jnp.ndarray,  # [M] f32
    rrf_k: int,
    k_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    m, k = ids.shape
    flat = ids.reshape(-1)                                     # [MK]
    ranks = lax.broadcasted_iota(jnp.int32, (m, k), 1).reshape(-1)
    w = jnp.repeat(weights.astype(jnp.float32), k)
    contrib = w / (jnp.float32(rrf_k) + ranks.astype(jnp.float32) + 1.0)
    valid = flat >= 0
    contrib = jnp.where(valid, contrib, 0.0)

    # Pairwise identity matrix over the (small) candidate union:
    # fused[i] = sum_j contrib[j] [flat[j] == flat[i]]
    eq = (flat[:, None] == flat[None, :]) & valid[:, None] & valid[None, :]
    fused = jnp.sum(jnp.where(eq, contrib[None, :], 0.0), axis=1)
    # method-hit count per candidate (ranker featurize input,
    # reference ranker.py:57-77 "method_count")
    counts = jnp.sum(eq, axis=1)

    # Dedup: keep only the first occurrence of each id.
    idx = lax.broadcasted_iota(jnp.int32, (flat.shape[0], 1), 0).squeeze(-1)
    earlier = eq & (idx[None, :] < idx[:, None])
    first = jnp.logical_not(jnp.any(earlier, axis=1)) & valid

    masked = jnp.where(first, fused, NEG_INF)
    top_s, sel = lax.top_k(masked, k_out)
    top_i = jnp.where(top_s <= NEG_INF, -1, flat[sel])
    top_c = jnp.where(top_s <= NEG_INF, 0, counts[sel])
    top_s = jnp.where(top_s <= NEG_INF, NEG_INF, top_s)
    return top_s, top_i, top_c.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rrf_k", "k_out"))
def rrf_fuse(
    ids: jnp.ndarray,       # [M, Q, K] i32 per-method candidate ids (-1 pad)
    weights: jnp.ndarray,   # [M] f32 per-method weights
    *,
    rrf_k: int = 60,
    k_out: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted reciprocal-rank fusion with dedup, batched over queries.

    Returns ``(fused_scores [Q, k_out], fused_ids [Q, k_out],
    method_counts [Q, k_out])``.  Scores follow the reference formula
    ``sum_m w_m / (rrf_k + rank_m + 1)`` (retrieval.py:433-462).
    """
    fn = functools.partial(_rrf_one_query, weights=weights, rrf_k=rrf_k, k_out=k_out)
    return jax.vmap(lambda x: fn(x))(jnp.swapaxes(ids, 0, 1))


@functools.partial(jax.jit, static_argnames=("k", "normalize"))
def mmr_select(
    cand_emb: jnp.ndarray,   # [C, D] candidate embeddings
    rel: jnp.ndarray,        # [C] relevance scores (fused)
    k: int,
    lambda_mult: float = 0.8,
    valid: jnp.ndarray | None = None,   # [C] bool
    *,
    normalize: bool = True,
) -> jnp.ndarray:
    """Greedy maximal-marginal-relevance selection on embedding cosine.

    ``mmr_i = lambda * rel_i - (1 - lambda) * max_{j in S} sim(i, j)``
    (reference retrieval.py:493-516).  Returns the selected candidate
    positions ``[k] i32`` in pick order (-1 where fewer than k valid).
    The greedy loop is a `lax.fori_loop` over k <= MAX_TOP_K; the pairwise
    similarity matrix is one small MXU matmul.
    """
    c = cand_emb.shape[0]
    e = l2_normalize(cand_emb) if normalize else cand_emb.astype(jnp.float32)
    sim = jnp.dot(e, e.T, preferred_element_type=jnp.float32)  # [C, C]
    ok = valid.astype(jnp.bool_) if valid is not None else jnp.ones((c,), jnp.bool_)
    # Min-max relevance to [0, 1] over the valid candidates BEFORE
    # blending: fused RRF scores have ~1/rrf_k dynamic range
    # (top-vs-bottom gap ~0.002), so on the raw scale the
    # (1-lambda)*sim term dominates and MMR picks off-topic docs from
    # rank 2 on near-duplicate corpora (observed: 4/10 on-topic at
    # lambda=0.8 where the fused order was 10/10).  [0, 1] is the scale
    # the reference formula assumes (its rel are cosine-like scores,
    # retrieval.py:493-516) and keeps lambda's meaning against cosine
    # similarities; the transform is monotone, so the first
    # (pure-relevance) pick is unchanged.
    relf = rel.astype(jnp.float32)
    lo = jnp.min(jnp.where(ok, relf, jnp.inf))
    hi = jnp.max(jnp.where(ok, relf, -jnp.inf))
    rel01 = (relf - lo) / jnp.maximum(hi - lo, 1e-12)
    rel = jnp.where(ok, rel01, NEG_INF)

    lam = jnp.float32(lambda_mult)

    def body(i, state):
        selected, max_sim, avail = state
        # First pick is pure relevance (max_sim starts at 0).
        mmr = lam * rel - (1.0 - lam) * max_sim
        mmr = jnp.where(avail, mmr, NEG_INF)
        pick = jnp.argmax(mmr).astype(jnp.int32)
        has_any = jnp.max(mmr) > NEG_INF
        pick = jnp.where(has_any, pick, -1)
        selected = selected.at[i].set(pick)
        safe = jnp.maximum(pick, 0)
        max_sim = jnp.where(
            has_any, jnp.maximum(max_sim, sim[:, safe]), max_sim
        )
        avail = avail & (lax.broadcasted_iota(jnp.int32, (c, 1), 0).squeeze(-1) != pick)
        return selected, max_sim, avail

    selected = jnp.full((k,), -1, dtype=jnp.int32)
    max_sim = jnp.zeros((c,), dtype=jnp.float32)
    # unrolled: k <= MAX_TOP_K steps of [C]-sized VPU ops — unrolling
    # removes the loop-carry sync per step and lets XLA pipeline them
    selected, _, _ = lax.fori_loop(0, k, body, (selected, max_sim, ok),
                                   unroll=True)
    return selected


@jax.jit
def recency_boost(
    timestamps: jnp.ndarray,   # [K] seconds since epoch (f32/f64-safe as f32)
    now: jnp.ndarray,          # scalar seconds
    half_life_days: jnp.ndarray,  # scalar days
) -> jnp.ndarray:
    """Exponential recency factor in [0, 1] (reference retrieval.py:472-483
    annotates recency from chunk timestamps; here it is one VPU op)."""
    age_days = jnp.maximum(now - timestamps.astype(jnp.float32), 0.0) / 86400.0
    return jnp.exp2(-age_days / jnp.maximum(half_life_days, 1e-6))


__all__ = ["rrf_fuse", "mmr_select", "recency_boost"]
