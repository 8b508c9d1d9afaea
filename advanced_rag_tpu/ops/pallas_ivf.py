"""Pallas IVF search: probed partitions stream HBM->VMEM, no gather.

The XLA path (`ops/ivf.py::ivf_topk`) evaluates ``packed_emb[probes]``
— a materialized [nprobe, cap, D] gather written to HBM and re-read by
the einsum (~3x the necessary traffic).  Here the probe ids are
SCALAR-PREFETCH arguments (pallas_guide.md: PrefetchScalarGridSpec), so
the BlockSpec index_map selects partition ``probes[i]`` per grid step
and Mosaic's pipeline DMAs each slab into VMEM exactly once, overlapped
with the matmul of the previous slab.

``ivf_topk_pallas`` is the single-query latency kernel;
``ivf_topk_pallas_batch`` extends it to query batches with a
(Q, nprobe) grid — each query's probed slabs stream once, so batches
no longer fall back to the 3x-traffic XLA gather path (VERDICT r1 #4).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import NEG_INF, merge_topk
from .ivf import IVFPartitions


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _slab_kernel(probes_ref, q_ref, emb_ref, out_ref):
    """One probed partition vs one query -> [1, cap] scores.

    Mosaic requires each block's LAST TWO dims to be (8,128)-divisible
    or equal to the array dims — hence the singleton axis in the output
    ([nprobe, 1, cap] blocked (1, 1, cap)): a (1, cap) block over
    [nprobe, cap] is illegal for nprobe > 1.
    """
    del probes_ref  # consumed by the index_map
    e = emb_ref[0]                               # [cap, D] storage dtype
    q = q_ref[:]                                 # [1, D] f32
    out_ref[0] = jnp.dot(q, e.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_topk_pallas(
    parts: IVFPartitions,
    query: jnp.ndarray,                  # [D] f32 (one query)
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    nprobe: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores [k], row ids [k]); same contract as ivf_topk for Q=1."""
    nlist, cap, d = parts.packed_emb.shape
    nprobe = min(nprobe, nlist)
    q = query.astype(jnp.float32)[None, :]       # [1, D]

    c_scores = jnp.dot(q, parts.centroids.T,
                       preferred_element_type=jnp.float32)
    _, probe = lax.top_k(c_scores[0], nprobe)    # [nprobe]
    probe = probe.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprobe,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, probes: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, d), lambda i, probes: (probes[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cap), lambda i, probes: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scores = pl.pallas_call(
        _slab_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprobe, 1, cap), jnp.float32),
        interpret=_interpret(),
    )(probe, q, parts.packed_emb)[:, 0, :]       # [nprobe, cap]

    rows = parts.packed_rows[probe]              # [nprobe, cap] (tiny gather)
    ok = rows >= 0
    if valid is not None:
        ok = jnp.logical_and(ok, valid[jnp.clip(rows, 0)])
    flat_s = jnp.where(ok, scores, NEG_INF).reshape(-1)
    flat_r = jnp.where(ok, rows, -1).reshape(-1)
    top_s, sel = lax.top_k(flat_s, k)
    top_i = jnp.where(top_s <= NEG_INF, -1, flat_r[sel])

    # exact tail merge (overflow rows), identical to the XLA path
    ts = jnp.dot(q, parts.tail_emb.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32)[0]
    t_ok = parts.tail_rows >= 0
    if valid is not None:
        t_ok = jnp.logical_and(t_ok, valid[jnp.clip(parts.tail_rows, 0)])
    ts = jnp.where(t_ok, ts, NEG_INF)
    kk = min(k, parts.tail_emb.shape[0])
    tail_s, tsel = lax.top_k(ts, kk)
    tail_i = jnp.where(tail_s <= NEG_INF, -1, parts.tail_rows[tsel])
    top_s, top_i = merge_topk(top_s[None], top_i[None],
                              tail_s[None], tail_i[None], k)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s[0], top_i[0]


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_topk_pallas_batch(
    parts: IVFPartitions,
    queries: jnp.ndarray,                # [Q, D] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    nprobe: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched slab kernel -> (scores [Q, k], rows [Q, k]).

    Grid (Q, nprobe): step (qi, i) streams partition ``probes[qi, i]``
    into VMEM and scores it against query qi.  Per-step compute is a
    [1, D] x [D, cap] matvec — bandwidth-bound, so the MXU
    underutilization is irrelevant; the win over the XLA path is that
    no [Q, nprobe, cap, D] gather is ever materialized in HBM.
    """
    nlist, cap, d = parts.packed_emb.shape
    nprobe = min(nprobe, nlist)
    q = queries.astype(jnp.float32)
    nq = q.shape[0]

    c_scores = jnp.dot(q, parts.centroids.T,
                       preferred_element_type=jnp.float32)  # [Q, nlist]
    _, probes = lax.top_k(c_scores, nprobe)                 # [Q, nprobe]
    probes = probes.astype(jnp.int32)

    sq8 = parts.packed_scale is not None
    if sq8:
        # quantize the query exactly like the XLA path (int8 x int8,
        # rescale by q_scale * row_scale) so ranks are bit-identical;
        # integer-valued f32 dot is exact (D * 127^2 << 2^24)
        from .quant import sq8_quantize

        q_codes, q_scale = sq8_quantize(q)
        q_in = q_codes.astype(jnp.float32)
    else:
        q_in = q
    # Mosaic block-shape rule: each block's LAST TWO dims must be
    # (8,128)-divisible or equal to the array's — so every per-step
    # slice is shaped with a leading singleton pair ([X, 1, width]
    # blocked (1, 1, width)); see _slab_kernel docstring.
    q3 = q_in[:, None, :]                            # [Q, 1, D]
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda qi, i, probes: (qi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cap, d),
                     lambda qi, i, probes: (probes[qi, i], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q3, parts.packed_emb]
    if sq8:
        in_specs.append(
            pl.BlockSpec((1, 1, cap),
                         lambda qi, i, probes: (probes[qi, i], 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(parts.packed_scale[:, None, :])  # [nlist, 1, cap]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nprobe),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, cap),
                               lambda qi, i, probes: (qi, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(probes_ref, q_ref, emb_ref, *rest):
        del probes_ref
        e = emb_ref[0]                               # [cap, D]
        s = jnp.dot(q_ref[0], e.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)   # [1, cap]
        if sq8:
            scale_ref, out_ref = rest
            out_ref[0, 0] = s * scale_ref[0]         # per-row dequant
        else:
            (out_ref,) = rest
            out_ref[0, 0] = s

    scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nprobe, 1, cap), jnp.float32),
        interpret=_interpret(),
    )(probes, *operands)[:, :, 0, :]                 # [Q, nprobe, cap]
    if sq8:
        scores = scores * q_scale[:, None, None]

    rows = parts.packed_rows[probes]                 # [Q, nprobe, cap]
    ok = rows >= 0
    if valid is not None:
        ok = jnp.logical_and(ok, valid[jnp.clip(rows, 0)])
    flat_s = jnp.where(ok, scores, NEG_INF).reshape(nq, -1)
    flat_r = jnp.where(ok, rows, -1).reshape(nq, -1)
    top_s, sel = lax.top_k(flat_s, k)
    top_i = jnp.where(top_s <= NEG_INF, -1,
                      jnp.take_along_axis(flat_r, sel, axis=1))

    # exact tail merge (overflow rows), identical to the XLA path
    ts = jnp.dot(q_in, parts.tail_emb.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32)  # [Q, T]
    if sq8:
        ts = ts * (q_scale[:, None] * parts.tail_scale[None, :])
    t_ok = parts.tail_rows >= 0
    if valid is not None:
        t_ok = jnp.logical_and(t_ok, valid[jnp.clip(parts.tail_rows, 0)])
    ts = jnp.where(t_ok[None, :], ts, NEG_INF)
    kk = min(k, parts.tail_emb.shape[0])
    tail_s, tsel = lax.top_k(ts, kk)
    tail_i = jnp.where(tail_s <= NEG_INF, -1, parts.tail_rows[tsel])
    top_s, top_i = merge_topk(top_s, top_i, tail_s, tail_i, k)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


__all__ = ["ivf_topk_pallas", "ivf_topk_pallas_batch"]
