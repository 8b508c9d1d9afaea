"""Product-quantized (PQ) dense tier: ~150M rows per chip.

The capacity ladder above SQ8 (ops/quant.py).  Where SQ8 stores one int8
per dimension (384 B/row at D=384), PQ stores one small code per
*subspace*: D is split into ``m`` contiguous sub-vectors of ``D/m`` dims,
each quantized to its own ``c = 2**bits``-entry codebook.  At the
default bits=4, m=D/4 geometry that is 96 codes x 1 byte = 96 B/row —
4x smaller than SQ8, 16x smaller than f32 (10M x 384 = 0.96 GB; a v5e
chip holds ~150M rows with room for the sparse index; set pq_m=D/2 for
2 bits/dim when recall matters more than capacity).  This replaces
the Milvus ``IVF_PQ`` index type for corpora past the SQ8 tier
(reference exposes index-type choice at indexing.py:62-77; SURVEY.md §7
hard part 2 flags "optional PQ for the 10M tier").

TPU-native scoring (the part that must NOT be a translation): classic
PQ scores with per-query lookup tables — ``score(q, n) = sum_m
LUT[q, m, codes[n, m]]`` — a gather per code, the one access pattern
TPUs punish.  Here the gather is reformulated as a MATMUL: the code
block is expanded to a one-hot [B, m*c] bf16 tile IN VMEM (a VPU
compare against an iota, never touching HBM) and multiplied against the
flattened LUT [Q, m*c] on the MXU:

    scores[Q, B] = LUT[Q, m*c] @ onehot(codes[B, m])^T

FLOP cost is (m*c/D)x an exact scan (4x at bits=4) — far below the
MXU/HBM ratio, so the scan stays HBM-bound on the 16x-smaller codes.
The Pallas kernel (``pq_scores_pallas``) keeps the one-hot expansion
VMEM-resident; the XLA fallback materializes it per block and is used
for correctness tests and small corpora.

Raw PQ ranking is approximate (1 bit/dim); the intended operating point
is over-retrieve + exact re-score from the f32 host mirror
(``IndexConfig.refine_factor``, shared with the SQ8 tier — BACKLOG #2),
which restores exact final scores at zero device-memory cost.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .dense import NEG_INF, cdiv, merge_topk


class PQCodebook(NamedTuple):
    codebooks: jnp.ndarray   # [m, c, dsub] f32
    m: int
    bits: int

    @property
    def c(self) -> int:
        return 1 << self.bits

    @property
    def dsub(self) -> int:
        return int(self.codebooks.shape[-1])

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def auto_pq_m(dim: int, bits: int = 4) -> int:
    """Default geometry: ~1 stored bit per input dim (dsub=4 at bits=4,
    dsub=8 at bits=8), clamped so dim % m == 0."""
    dsub = 4 if bits <= 4 else 8
    while dim % dsub:
        dsub //= 2
    return max(dim // dsub, 1)


@functools.partial(jax.jit, static_argnames=("c", "iters"))
def _pq_kmeans(
    x: jnp.ndarray,       # [m, Nt, dsub] f32 training sub-vectors
    init: jnp.ndarray,    # [m, c, dsub] f32
    *,
    c: int,
    iters: int = 12,
) -> jnp.ndarray:
    """Euclidean Lloyd's over all m subspaces at once (one program).
    Assignment maximizes x.cb - ||cb||^2/2 == minimizes L2 distance;
    empty clusters keep their centroid (same convention as ops/ivf.py)."""

    def assign(cb):
        s = jnp.einsum("mnd,mcd->mnc", x, cb,
                       preferred_element_type=jnp.float32)
        s = s - 0.5 * jnp.sum(cb * cb, axis=-1)[:, None, :]
        return jnp.argmax(s, axis=-1)                       # [m, Nt]

    def step(cb, _):
        oh = jax.nn.one_hot(assign(cb), c, dtype=jnp.float32)  # [m, Nt, c]
        sums = jnp.einsum("mnc,mnd->mcd", oh, x,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(oh, axis=1)                        # [m, c]
        return jnp.where(counts[..., None] > 0,
                         sums / jnp.maximum(counts[..., None], 1.0), cb), None

    cb, _ = lax.scan(step, init.astype(jnp.float32), None, length=iters)
    return cb


def pq_train(
    emb_host: np.ndarray,     # [N, D] f32 (pre-normalized for cosine)
    m: int = 0,
    bits: int = 4,
    *,
    iters: int = 12,
    train_sample: int = 65536,
    seed: int = 0,
) -> PQCodebook:
    """Train per-subspace codebooks on a sample of the host mirror."""
    n, d = emb_host.shape
    m = m or auto_pq_m(d, bits)
    if d % m:
        raise ValueError(f"dim {d} not divisible by pq_m {m}")
    c = 1 << bits
    x = emb_host
    if n > train_sample:
        sel = np.random.default_rng(seed).choice(n, train_sample,
                                                 replace=False)
        x = emb_host[sel]
    sub = np.ascontiguousarray(
        x.reshape(x.shape[0], m, d // m).transpose(1, 0, 2))  # [m, Nt, dsub]
    rng = np.random.default_rng(seed)
    pick = rng.choice(sub.shape[1], size=min(c, sub.shape[1]), replace=False)
    init = sub[:, pick]                                      # [m, <=c, dsub]
    if init.shape[1] < c:  # tiny corpora: tile
        reps = -(-c // init.shape[1])
        init = np.tile(init, (1, reps, 1))[:, :c]
    cb = _pq_kmeans(jnp.asarray(sub), jnp.asarray(init), c=c, iters=iters)
    return PQCodebook(codebooks=cb, m=m, bits=bits)


@functools.partial(jax.jit, static_argnames=())
def _encode_block(xb: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """[B, m, dsub] float x [m, c, dsub] -> nearest-centroid codes [B, m]
    int8 (cast ON DEVICE: the host tunnel downloads at ~25 MB/s, so code
    bytes — not int32 argmax output — are what cross it)."""
    s = jnp.einsum("bmd,mcd->bmc", xb.astype(jnp.float32), cb,
                   preferred_element_type=jnp.float32)
    s = s - 0.5 * jnp.sum(cb * cb, axis=-1)[None]
    return jnp.argmax(s, axis=-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block",))
def pq_encode_device(
    emb: jnp.ndarray,           # [N, D] float (any)
    codebooks: jnp.ndarray,     # [m, c, dsub] f32
    rotation: Optional[jnp.ndarray] = None,  # [D, D] OPQ rotation
    *,
    block: int = 8192,
) -> jnp.ndarray:
    """Device-resident encode: [N, D] -> codes [N, m] int8 with ZERO
    host transfers (one lax.scan; the [B, m, c] assignment scores stay
    bounded to one block).  This is the build/grow/restore path — the
    staged bf16 matrix is already in HBM, so encoding 10M rows costs
    milliseconds of MXU time instead of minutes of tunnel round-trips."""
    n, d = emb.shape
    m, c, dsub = codebooks.shape
    blk = min(block, n)
    nblocks = cdiv(n, blk)
    out_dt = jnp.uint8 if c > 128 else jnp.int8

    # Ragged tail via an OVERLAPPING last block (start clamped to
    # n - blk): the overlap rows are re-encoded to identical values.
    # No pad copy of `emb` — at the 10M tier a jnp.pad here would
    # duplicate a ~7 GB buffer and OOM the chip.
    def body(i, out):
        start = jnp.minimum(i * blk, n - blk)
        xb = lax.dynamic_slice(emb, (start, 0), (blk, d))
        if rotation is not None:  # OPQ: rotate per block (no big temp)
            xb = jnp.dot(xb.astype(jnp.float32), rotation,
                         preferred_element_type=jnp.float32)
        codes = _encode_block(xb.reshape(blk, m, dsub), codebooks)
        return lax.dynamic_update_slice(out, codes.astype(out_dt),
                                        (start, 0))

    return lax.fori_loop(0, nblocks, body,
                         jnp.zeros((n, m), out_dt))


def pq_encode(
    emb_host: np.ndarray, pq: PQCodebook, *, block: int = 262144
) -> np.ndarray:
    """f32 [N, D] -> codes int8 [N, m] (bits<=7) / uint8 (bits=8).
    Host convenience wrapper over the device encoder: uploads bf16
    (halves tunnel bytes; assignment argmax is tie-insensitive to bf16
    rounding), downloads 1 byte/code."""
    import ml_dtypes

    n, d = emb_host.shape
    out_dt = np.uint8 if pq.bits == 8 else np.int8
    out = np.zeros((n, pq.m), out_dt)
    inner = 8192
    for start in range(0, n, block):
        xb = emb_host[start:start + block]
        b = xb.shape[0]
        if b >= inner:              # pad to a block multiple
            pad = (-b) % inner
        else:                       # small batch: pow2 bounds recompiles
            pad = (1 << max(b - 1, 0).bit_length()) - b
        if pad:
            xb = np.concatenate([xb, np.zeros((pad, d), xb.dtype)])
        codes = pq_encode_device(
            jnp.asarray(xb.astype(ml_dtypes.bfloat16)), pq.codebooks,
            block=inner)
        out[start:start + b] = np.asarray(codes[:b]).astype(out_dt)
    return out


def opq_train(
    emb_host: np.ndarray,     # [N, D] f32 (pre-normalized for cosine)
    m: int = 0,
    bits: int = 4,
    *,
    opq_iters: int = 8,
    pq_iters: int = 4,
    final_iters: int = 12,
    train_sample: int = 65536,
    seed: int = 0,
) -> Tuple[jnp.ndarray, PQCodebook]:
    """OPQ (Ge et al.): learn an orthogonal rotation R that minimizes PQ
    reconstruction error, then train codebooks in the rotated space.

    Alternating minimization: train codebooks on X@R (few Lloyd iters),
    reconstruct X_hat, solve the orthogonal Procrustes problem
    min_R ||X R - X_hat||_F  via  SVD(X^T X_hat) = U S V^T, R = U V^T.
    Inner product is exactly preserved (q.x == (qR).(xR)), so queries
    just rotate before LUT construction; candidates decode to rotated
    vectors whose cosines are unchanged (MMR unaffected); the exact
    refinement pass uses the unrotated mirror and needs nothing.

    Returns (R [D, D] f32, PQCodebook over the rotated space)."""
    n, d = emb_host.shape
    m = m or auto_pq_m(d, bits)
    x = emb_host
    if n > train_sample:
        sel = np.random.default_rng(seed).choice(n, train_sample,
                                                 replace=False)
        x = emb_host[sel]
    xj = jnp.asarray(x, jnp.float32)
    r = jnp.eye(d, dtype=jnp.float32)
    pq = None
    for it in range(opq_iters):
        xr = np.asarray(xj @ r)
        pq = pq_train(xr, m, bits, iters=pq_iters,
                      train_sample=train_sample, seed=seed + it)
        codes = pq_encode(xr, pq)
        xhat = pq_decode(pq, jnp.asarray(codes))            # [Nt, D]
        # Procrustes: R = U V^T of X^T X_hat
        u, _, vt = jnp.linalg.svd(xj.T @ xhat, full_matrices=False)
        r = u @ vt
    pq = pq_train(np.asarray(xj @ r), m, bits, iters=final_iters,
                  train_sample=train_sample, seed=seed)
    return r, pq


def pq_decode(pq: PQCodebook, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [..., m] -> reconstructed vectors [..., D] f32 (used for
    MMR over candidate sets; small inputs, one-hot matmul again)."""
    oh = jax.nn.one_hot(codes.astype(jnp.int32), pq.c, dtype=jnp.float32)
    sub = jnp.einsum("...mc,mcd->...md", oh, pq.codebooks)
    return sub.reshape(*codes.shape[:-1], pq.dim)


def pq_lut(pq: PQCodebook, queries: jnp.ndarray) -> jnp.ndarray:
    """Per-query inner-product lookup tables -> [Q, m, c] f32.
    score(q, row) == sum_m LUT[q, m, codes[row, m]] exactly."""
    q = queries.astype(jnp.float32)
    q_sub = q.reshape(q.shape[0], pq.m, pq.dsub)
    return jnp.einsum("qmd,mcd->qmc", q_sub, pq.codebooks,
                      preferred_element_type=jnp.float32)


def pq_scores_xla(codes_blk: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """One-hot-matmul ADC, XLA reference path: [B, m] codes x [Q, m, c]
    LUT -> [Q, B] f32.  bf16 operands (MXU), f32 accumulation."""
    q, m, c = lut.shape
    b = codes_blk.shape[0]
    oh = jax.nn.one_hot(codes_blk.astype(jnp.int32), c, dtype=jnp.bfloat16)
    return jax.lax.dot_general(
        lut.reshape(q, m * c).astype(jnp.bfloat16), oh.reshape(b, m * c),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pq_scores_pallas(
    codes_sb: jnp.ndarray,    # [SB, m] int8/uint8 (SB % block == 0)
    lut: jnp.ndarray,         # [Q, m, c] f32
    *,
    block: int = 1024,
) -> jnp.ndarray:
    """Pallas ADC: the one-hot expansion lives only in VMEM — HBM traffic
    is exactly one read of the codes plus one write of [Q, SB] scores,
    the speed-of-light for this op.

    Mosaic kernels want 2D tiles (a [B, m, c] -> [B, m*c] shape cast is
    rejected by infer-vector-layout), so the one-hot matmul is expressed
    as a statically unrolled sum over code values:

        scores[Q, B] = sum_ci LUT[:, :, ci] @ (codes == ci)^T

    Each term is a [Q, m] x [m, B] MXU matmul against a VPU compare
    mask; total FLOPs are identical to the flat one-hot formulation.
    Requires bits <= 4 (c <= 16 unrolled terms) — bits=8 uses the XLA
    path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sb, m = codes_sb.shape
    q, m2, c = lut.shape
    assert m == m2 and sb % block == 0
    if c > 16:
        raise ValueError("pallas ADC supports bits<=4; use impl='xla'")
    # [c, m, Q] so the kernel slices a 2D [m, Q] tile per code value
    lut_cmq = jnp.transpose(lut, (2, 1, 0)).astype(jnp.bfloat16)

    def kernel(codes_ref, lut_ref, out_ref):
        codes = codes_ref[...].astype(jnp.int32)            # [B, m]
        acc = jnp.zeros((q, block), jnp.float32)
        for ci in range(c):                                 # static unroll
            mask = (codes == ci).astype(jnp.bfloat16)       # [B, m]
            acc = acc + jax.lax.dot_general(
                lut_ref[ci], mask,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [Q, B]
        out_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(sb // block,),
        in_specs=[
            pl.BlockSpec((block, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, m, q), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, sb), jnp.float32),
        interpret=_interpret(),
    )(codes_sb, lut_cmq)


@functools.partial(
    jax.jit,
    static_argnames=("k", "m", "bits", "block_size", "impl", "reduce"),
)
def pq_topk(
    codebooks: jnp.ndarray,               # [m, c, dsub] f32
    codes: jnp.ndarray,                   # [N, m] int8/uint8
    queries: jnp.ndarray,                 # [Q, D] f32 (normalized upstream)
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N] bool
    *,
    m: int,
    bits: int,
    block_size: int = 262144,
    impl: str = "pallas",                 # "pallas" | "xla"
    reduce: str = "approx",               # "approx" | "exact" block top-k
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked top-k over PQ codes; same contract as dense_topk.

    Scan over row superblocks: score (Pallas or XLA ADC) -> mask ->
    per-block top-k -> exact merge, so the [Q, N] score matrix never
    materializes.  PQ retrieval is candidate GENERATION (exact
    refinement re-ranks downstream), and the deep k this tier runs at
    (32x over-retrieve) makes the block reduction the dominant cost —
    ``reduce="approx"`` uses the TPU-native sort-free `approx_max_k`
    (measured 41 -> ~5 ms at 1M x K=320; recall_target 0.95 per block
    costs <1% candidate recall).
    """
    pq = PQCodebook(codebooks=codebooks, m=m, bits=bits)
    n = codes.shape[0]
    if n == 0:
        raise ValueError("pq_topk: empty corpus")
    if bits > 4:
        impl = "xla"  # pallas ADC unrolls over c; c=256 is XLA's job
    q = queries.astype(jnp.float32)
    lut = pq_lut(pq, q)                                     # [Q, m, c]

    inner = 1024
    bsz = min(block_size, max(inner, n))
    bsz = cdiv(bsz, inner) * inner
    nblocks = cdiv(n, bsz)
    padded = nblocks * bsz
    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)
    if padded != n:
        codes = jnp.pad(codes, ((0, padded - n), (0, 0)))
        v = jnp.pad(v, (0, padded - n))

    num_q = q.shape[0]
    init_s = jnp.full((num_q, k), NEG_INF, dtype=jnp.float32)
    init_i = jnp.full((num_q, k), -1, dtype=jnp.int32)
    blk_iota = lax.broadcasted_iota(jnp.int32, (1, bsz), 1)

    def body(carry, blk):
        top_s, top_i = carry
        start = blk * bsz
        c_blk = lax.dynamic_slice(codes, (start, 0), (bsz, m))
        v_blk = lax.dynamic_slice(v, (start,), (bsz,))
        if impl == "pallas":
            s = pq_scores_pallas(c_blk, lut, block=inner)   # [Q, B]
        else:
            s = pq_scores_xla(c_blk, lut)
        ids = blk_iota + start
        keep = jnp.logical_and(v_blk[None, :], ids < n)
        s = jnp.where(keep, s, NEG_INF)
        blk_ids = jnp.where(keep, ids, -1)
        blk_ids = jnp.broadcast_to(blk_ids, s.shape).astype(jnp.int32)
        kk = min(k, bsz)
        if reduce == "approx" and kk >= 16 and bsz > 4 * kk:
            bs, sel = lax.approx_max_k(s, kk, recall_target=0.95)
        else:
            bs, sel = lax.top_k(s, kk)
        bi = jnp.take_along_axis(blk_ids, sel, axis=1)
        if kk < k:
            bs = jnp.pad(bs, ((0, 0), (0, k - kk)), constant_values=float(NEG_INF))
            bi = jnp.pad(bi, ((0, 0), (0, k - kk)), constant_values=-1)
        return merge_topk(top_s, top_i, bs, bi, k), None

    (top_s, top_i), _ = lax.scan(
        body, (init_s, init_i), jnp.arange(nblocks, dtype=jnp.int32)
    )
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


__all__ = [
    "PQCodebook",
    "auto_pq_m",
    "pq_train",
    "opq_train",
    "pq_encode",
    "pq_encode_device",
    "pq_decode",
    "pq_lut",
    "pq_scores_xla",
    "pq_scores_pallas",
    "pq_topk",
]
