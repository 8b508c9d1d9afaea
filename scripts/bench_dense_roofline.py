"""Dense-scan roofline measurement at 10M x 384 (VERDICT r1 #3).

Compares the XLA blocked scan (ops/dense.py, measured ~425 GB/s in r1)
against the Pallas streaming-matmul kernel (ops/pallas_dense.py) on the
bf16 and SQ8 tiers, reporting achieved GB/s and the fraction of the
v5e's ~819 GB/s HBM peak.  Corpus staged on device in chunks.

Usage: python scripts/bench_dense_roofline.py [--n 10000000] [--q 8]
Prints one JSON line.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import os
import time

import numpy as np

HBM_PEAK_GBS = 819.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--q", type=int, default=8)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--block", type=int, default=8192)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from advanced_rag_tpu.ops.dense import dense_topk
    from advanced_rag_tpu.ops.pallas_dense import (
        dense_topk_pallas, dense_topk_sq8_pallas)
    from advanced_rag_tpu.ops.quant import dense_topk_sq8, sq8_quantize

    import functools

    n, d, q_n = args.n, args.d, args.q

    # Phased staging: the bf16 corpus (7.7 GB at 10M) and the SQ8 codes
    # (3.9 GB) never coexist with concat transients.  A preallocated
    # buffer is filled in place via donated dynamic_update_slice, so
    # peak = buffer + one chunk.
    chunk = min(1_250_000, n)
    n_pad = -(-n // chunk) * chunk

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_bf16(buf, ck, i):
        e = jax.random.normal(ck, (chunk, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, e.astype(jnp.bfloat16), (i, jnp.int32(0)))

    t0 = time.perf_counter()
    emb = jnp.zeros((n_pad, d), jnp.bfloat16)
    for j, ck in enumerate(jax.random.split(jax.random.PRNGKey(0),
                                            n_pad // chunk)):
        emb = fill_bf16(emb, ck, jnp.int32(j * chunk))
    jax.device_get(emb[:1, :1])  # literal fetch = real sync
    stage_s = time.perf_counter() - t0

    q = jax.random.normal(jax.random.PRNGKey(9), (q_n, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    valid = (jnp.arange(n_pad) < n)

    # true device timing: the whole round chain runs inside ONE jitted
    # program (utils/timing.py scanned_ms) — chained host dispatches
    # carry a ~4.5 ms/call tunnel floor that at 1M rows exceeds the
    # kernel itself (measured; a trivial op "took" 4.5 ms)
    from advanced_rag_tpu.utils.timing import scanned_ms

    res = {"n": n, "d": d, "q": q_n, "stage_s": round(stage_s, 1)}

    def record(name, ms, bytes_scanned):
        gbs = bytes_scanned / (ms / 1e3) / 1e9
        res[name] = {"ms": round(ms, 2), "gbs": round(gbs, 0),
                     "hbm_fraction": round(gbs / HBM_PEAK_GBS, 3)}

    from advanced_rag_tpu.ops.dense import dense_topk_approx

    bf_bytes = n_pad * d * 2
    record("xla_bf16_blocked", scanned_ms(
        lambda eps, e, v, qq: dense_topk(
            e, qq + eps, args.k, v, metric="ip", normalize_queries=False,
            block_size=65536)[1],
        rounds=args.rounds, operands=(emb, valid, q)), bf_bytes)
    record("xla_bf16_approx", scanned_ms(
        lambda eps, e, v, qq: dense_topk_approx(
            e, qq + eps, args.k, v, metric="ip")[1],
        rounds=args.rounds, operands=(emb, valid, q)), bf_bytes)
    record("pallas_bf16", scanned_ms(
        lambda eps, e, v, qq: dense_topk_pallas(
            e, qq + eps, args.k, v, metric="ip", normalize_queries=False,
            block_size=args.block)[1],
        rounds=args.rounds, operands=(emb, valid, q)), bf_bytes)

    # Quantize chunked into a donated int8 buffer, then release bf16.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_sq8(cbuf, sbuf, part, i):
        c, s = sq8_quantize(part.astype(jnp.float32))
        return (jax.lax.dynamic_update_slice(cbuf, c, (i, jnp.int32(0))),
                jax.lax.dynamic_update_slice(sbuf, s, (i,)))

    codes = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.zeros((n_pad,), jnp.float32)
    for i in range(0, n_pad, chunk):
        codes, scale = fill_sq8(
            codes, scale,
            jax.lax.dynamic_slice_in_dim(emb, i, chunk, 0), jnp.int32(i))
    jax.device_get(codes[:1, :1])
    del emb

    from advanced_rag_tpu.ops.quant import dense_topk_sq8_approx

    sq_bytes = n_pad * (d + 4)
    record("xla_sq8_blocked", scanned_ms(
        lambda eps, c, s, v, qq: dense_topk_sq8(
            c, s, qq + eps, args.k, v, metric="ip",
            normalize_queries=False)[1],
        rounds=args.rounds, operands=(codes, scale, valid, q)), sq_bytes)
    record("xla_sq8_approx", scanned_ms(
        lambda eps, c, s, v, qq: dense_topk_sq8_approx(
            c, s, qq + eps, args.k, v, metric="ip",
            normalize_queries=False)[1],
        rounds=args.rounds, operands=(codes, scale, valid, q)), sq_bytes)
    record("pallas_sq8", scanned_ms(
        lambda eps, c, s, v, qq: dense_topk_sq8_pallas(
            c, s, qq + eps, args.k, v, metric="ip",
            normalize_queries=False, block_size=args.block)[1],
        rounds=args.rounds, operands=(codes, scale, valid, q)), sq_bytes)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
