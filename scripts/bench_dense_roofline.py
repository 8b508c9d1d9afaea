"""Dense-scan roofline measurement at 10M x 384 (VERDICT r1 #3).

Compares the XLA blocked scan (ops/dense.py, measured ~425 GB/s in r1)
against the Pallas streaming-matmul kernel (ops/pallas_dense.py) on the
bf16 and SQ8 tiers, reporting achieved GB/s and the fraction of the
v5e's ~819 GB/s HBM peak.  Corpus staged on device in chunks.

Usage: python scripts/bench_dense_roofline.py [--n 10000000] [--q 8]
Prints one JSON line.
"""

from __future__ import annotations

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
    ap.add_argument("--rounds", type=int, default=10)
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

    n, d, q_n = args.n, args.d, args.q

    # chunked device staging (one-shot normal+normalize OOMs at 10M)
    chunk = min(2_500_000, n)
    parts = []
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(ck):
        e = jax.random.normal(ck, (chunk, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return e.astype(jnp.bfloat16)

    t0 = time.perf_counter()
    for ck in jax.random.split(key, -(-n // chunk)):
        parts.append(gen(ck))
    emb = jnp.concatenate(parts, axis=0)[:n]
    del parts
    codes, scale = sq8_quantize(emb.astype(jnp.float32)) \
        if n <= 2_500_000 else (None, None)
    if codes is None:
        # quantize in chunks to bound transients
        cparts, sparts = [], []
        for i in range(0, n, chunk):
            c, s = sq8_quantize(
                jax.lax.dynamic_slice_in_dim(emb, i, min(chunk, n - i), 0)
                .astype(jnp.float32))
            cparts.append(c)
            sparts.append(s)
        codes = jnp.concatenate(cparts, axis=0)
        scale = jnp.concatenate(sparts, axis=0)
        del cparts, sparts
    jax.block_until_ready((emb, codes))
    stage_s = time.perf_counter() - t0

    q = jax.random.normal(jax.random.PRNGKey(9), (q_n, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    valid = jnp.ones((n,), jnp.bool_)

    def amortized(fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.rounds * 1e3

    res = {"n": n, "d": d, "q": q_n, "stage_s": round(stage_s, 1)}

    def record(name, ms, bytes_scanned):
        gbs = bytes_scanned / (ms / 1e3) / 1e9
        res[name] = {"ms": round(ms, 2), "gbs": round(gbs, 0),
                     "hbm_fraction": round(gbs / HBM_PEAK_GBS, 3)}

    bf_bytes = n * d * 2
    record("xla_bf16", amortized(lambda: dense_topk(
        emb, q, args.k, valid, metric="ip", normalize_queries=False,
        block_size=65536)[1]), bf_bytes)
    record("pallas_bf16", amortized(lambda: dense_topk_pallas(
        emb, q, args.k, valid, metric="ip", normalize_queries=False,
        block_size=args.block)[1]), bf_bytes)

    sq_bytes = n * (d + 4)
    record("xla_sq8", amortized(lambda: dense_topk_sq8(
        codes, scale, q, args.k, valid, metric="ip",
        normalize_queries=False)[1]), sq_bytes)
    record("pallas_sq8", amortized(lambda: dense_topk_sq8_pallas(
        codes, scale, q, args.k, valid, metric="ip",
        normalize_queries=False, block_size=args.block)[1]), sq_bytes)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
