"""Cross-shard top-k reduction over ICI.

The distributed half of search (SURVEY.md §2d item 4, §7 B4): each
shard computes a local masked top-k, then ONLY k (score, id) pairs per
query cross the interconnect — never raw scores or embeddings.

Two merge strategies, both called INSIDE `shard_map`:

- ``gather_merge_topk``: one `all_gather` of the [k] candidates over the
  shard axis, then a replicated `lax.top_k` of the [S*k] union.  Payload
  S*k*8 bytes/query — at S<=256, k<=100 this is well under a microsecond
  of ICI time and one collective deep.
- ``tree_merge_topk``: log2(S) `ppermute` rounds keeping the payload at
  k per link (the "log-tree" of SURVEY.md §5).  Wins only when S*k
  outgrows the latency of extra rounds; exposed for the pod-scale tier.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from ..ops.dense import NEG_INF, merge_topk


def gather_merge_topk(
    scores: jnp.ndarray,   # [Q, k] local top-k scores
    ids: jnp.ndarray,      # [Q, k] local top-k GLOBAL ids (-1 pad)
    k: int,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-gather merge; result is replicated across the shard axis."""
    all_s = lax.all_gather(scores, axis_name)          # [S, Q, k]
    all_i = lax.all_gather(ids, axis_name)
    q = scores.shape[0]
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(q, -1)   # [Q, S*k]
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(q, -1)
    top_s, sel = lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


def tree_merge_topk(
    scores: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    axis_name: str,
    num_shards: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recursive-halving merge: log2(S) ppermute rounds, payload k/link.

    Requires ``num_shards`` to be a power of two (mesh axes are).  After
    the last round every shard holds the identical global top-k, same
    contract as ``gather_merge_topk``.
    """
    if num_shards & (num_shards - 1):
        raise ValueError("tree_merge_topk requires a power-of-two shard axis")
    s, i = scores, ids
    step = 1
    while step < num_shards:
        # Exchange with the partner at distance `step` (butterfly), so
        # every shard ends replicated without a broadcast round.
        perm = [
            (src, src ^ step) for src in range(num_shards)
        ]
        peer_s = lax.ppermute(s, axis_name, perm)
        peer_i = lax.ppermute(i, axis_name, perm)
        s, i = merge_topk(s, i, peer_s, peer_i, k)
        step *= 2
    return s, i


__all__ = ["gather_merge_topk", "tree_merge_topk"]
