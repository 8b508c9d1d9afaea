"""Headline benchmark: fused hybrid retrieval latency on one TPU chip.

Measures the device engine that replaces Milvus (HNSW semantic search +
SPARSE_INVERTED_INDEX BM25 + CPU RRF/MMR fusion — reference
indexing.py:445-551, retrieval.py:421-516): ONE jitted program doing
masked dense top-k over [N, 384] bf16, masked BM25 top-k over fixed-nnz
rows, weighted RRF with dedup, and cosine-MMR, at N = 1M chunks
(BASELINE.json config "hybrid QPS at 1M chunks; p50/p99 retrieve ms").

Baseline: the reference's published p95-latency target for end-to-end
retrieve is 80 ms "with proper hardware" (README.md:303, pipeline.py:40,
BASELINE.md).  ``vs_baseline`` = 80 / p50 (times faster than the SLA).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_N (corpus rows), BENCH_NNZ, BENCH_ITERS, BENCH_BATCH.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from advanced_rag_tpu.ops.hybrid import hybrid_retrieve

    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("BENCH_D", 384))
    nnz = int(os.environ.get("BENCH_NNZ", 64))
    vocab = int(os.environ.get("BENCH_VOCAB", 16384))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    q_batch = int(os.environ.get("BENCH_BATCH", 8))
    k_cand, k_out = 40, 24  # top_k=20 profile, 2x over-retrieve, 8-bucketed
    baseline_ms = 80.0      # reference retrieve SLA (BASELINE.md)

    # dense storage tier: "int8" = SQ8 codes (production semantic_dtype
    # knob; 2x bf16 scan speed at ~0.99 overlap), "bf16" = approx_max_k,
    # "pq" = product-quantized codes (96 B/row; raw ADC ranks in-program
    # — the manager's host refinement is outside this kernel bench)
    dtype = os.environ.get("BENCH_DTYPE", "int8")

    # Disk-cached corpus + postings generation (host gen at 1M x 384
    # costs minutes on one core; retries should pay only upload time).
    from pathlib import Path

    from advanced_rag_tpu.ops.postings import auto_postings_cap, build_postings
    from advanced_rag_tpu.ops.quant import sq8_quantize_host

    cache_dir = Path(os.environ.get("BENCH_CACHE", "/tmp/rag_bench_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    # one .npy per array, loaded mmap'd: the bench host CPU is burst-
    # throttled, so a multi-GB npz read is minutes of wall clock while
    # mmap costs nothing until device_put pages it in
    cache = cache_dir / f"corpus_{n}_{d}_{nnz}_{vocab}"
    import ml_dtypes as _mld

    def _mm(name):
        return np.load(cache / f"{name}.npy", mmap_mode="r")

    if (cache / "ok").exists():
        # bf16 arrays are stored as uint16 bit-views (npy mangles
        # ml_dtypes otherwise)
        emb16 = _mm("emb16").view(_mld.bfloat16)
        codes, scale = _mm("codes"), _mm("scale")
        doc_idx = _mm("doc_idx")
        doc_tf16 = _mm("doc_tf16").view(_mld.bfloat16)
        doc_len, df = _mm("doc_len"), _mm("df")
        post_rows = _mm("post_rows")
        post_tf16 = _mm("post_tf16").view(_mld.bfloat16)
    else:
        import ml_dtypes

        rng0 = np.random.default_rng(0)
        emb = rng0.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        codes, scale = sq8_quantize_host(emb)
        emb16 = emb.astype(ml_dtypes.bfloat16)
        del emb
        doc_idx = rng0.integers(0, vocab, (n, nnz)).astype(np.int32)
        doc_tf = (1.0 + rng0.random((n, nnz))).astype(np.float32)
        doc_len = np.full((n,), 1.5 * nnz, np.float32)
        df = np.maximum(np.bincount(doc_idx[: min(n, 100_000)].reshape(-1),
                                    minlength=vocab), 1).astype(np.int32)
        cap = auto_postings_cap(n, nnz, vocab)
        post_rows, post_tf = build_postings(doc_idx, doc_tf, vocab, cap)
        doc_tf16 = doc_tf.astype(ml_dtypes.bfloat16)
        post_tf16 = post_tf.astype(ml_dtypes.bfloat16)
        cache.mkdir(parents=True, exist_ok=True)
        for name, arr in (("emb16", emb16.view(np.uint16)), ("codes", codes),
                          ("scale", scale), ("doc_idx", doc_idx),
                          ("doc_tf16", doc_tf16.view(np.uint16)),
                          ("doc_len", doc_len), ("df", df),
                          ("post_rows", post_rows),
                          ("post_tf16", post_tf16.view(np.uint16))):
            np.save(cache / f"{name}.npy", arr)
        (cache / "ok").touch()

    pq_args = {}
    pq_kw = {}
    if dtype == "int8":
        emb_dev = jax.device_put(jnp.asarray(codes))
        emb_scale = jax.device_put(jnp.asarray(scale))
    elif dtype == "pq":
        from advanced_rag_tpu.ops.pq import pq_encode_device, pq_train

        sel = np.sort(np.random.default_rng(7).choice(
            n, min(n, 65536), replace=False))
        pq = pq_train(np.asarray(emb16[sel], np.float32), bits=4)
        emb_dev = pq_encode_device(jax.device_put(jnp.asarray(emb16)),
                                   pq.codebooks)
        emb_scale = None
        pq_args = {"pq_codebooks": pq.codebooks}
        pq_kw = {"pq_m": pq.m, "pq_bits": 4,
                 "pq_impl": "pallas" if jax.default_backend() == "tpu"
                 else "xla"}
    else:
        emb_dev = jax.device_put(jnp.asarray(emb16))
        emb_scale = None
    di = jax.device_put(jnp.asarray(doc_idx))
    # production layout: bf16 term frequencies (index/sparse_index.py)
    dt = jax.device_put(jnp.asarray(doc_tf16))
    dl = jax.device_put(jnp.asarray(doc_len))
    dfj = jax.device_put(jnp.asarray(df))
    valid = jax.device_put(jnp.ones((n,), jnp.bool_))
    weights = jnp.asarray([0.7, 0.3], jnp.float32)
    pr = jax.device_put(jnp.asarray(post_rows))
    pt = jax.device_put(jnp.asarray(post_tf16))

    rng = np.random.default_rng(1)
    on_tpu = jax.default_backend() == "tpu"

    if dtype == "int8":
        dense_impl = "sq8"
    elif dtype == "pq":
        dense_impl = "pq"
    else:
        dense_impl = "approx" if on_tpu else "scan"

    def run(q_dense, q_idx, q_tf):
        return hybrid_retrieve(
            emb_dev, di, dt, dl, dfj, jnp.float32(n),
            q_dense, q_idx, q_tf, valid, weights, jnp.float32(0.8),
            post_rows=pr, post_tf=pt, emb_scale=emb_scale, **pq_args,
            k_cand=k_cand, k_out=k_out, metric="ip", use_mmr=True,
            dense_impl=dense_impl,
            sparse_impl="postings", **pq_kw,
        )

    def make_queries(batch):
        q = rng.standard_normal((batch, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qi = rng.integers(0, vocab, (batch, 16)).astype(np.int32)
        qt = np.ones((batch, 16), np.float32)
        return jnp.asarray(q), jnp.asarray(qi), jnp.asarray(qt)

    # warmup/compile for both batch shapes
    for b in (1, q_batch):
        res = run(*make_queries(b))
        jax.block_until_ready(res.ids)

    lat = []
    for _ in range(iters):
        args = make_queries(1)
        t0 = time.perf_counter()
        res = run(*args)
        jax.block_until_ready(res.ids)
        lat.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))

    tput = []
    for _ in range(max(iters // 3, 5)):
        args = make_queries(q_batch)
        t0 = time.perf_counter()
        res = run(*args)
        jax.block_until_ready(res.ids)
        tput.append(q_batch / (time.perf_counter() - t0))
    qps = float(np.median(tput))

    # steady-state serving throughput: the micro-batcher keeps the queue
    # full, so dispatches pipeline and the per-call host<->device RTT
    # amortizes away — dispatch R batches back-to-back, block once.
    rounds = 12
    batches = [make_queries(q_batch) for _ in range(rounds)]
    run(*batches[0])  # ensure program cached
    t0 = time.perf_counter()
    results = [run(*b) for b in batches]
    jax.block_until_ready([r.ids for r in results])
    qps_pipe = rounds * q_batch / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "hybrid_retrieve_p50_ms_1M",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / p50, 2),
        "extra": {
            "p99_ms": round(p99, 2),
            "qps_batch8": round(qps, 1),
            "qps_batch8_pipelined": round(qps_pipe, 1),
            "corpus_rows": n,
            "dim": d,
            "dtype": dtype,
            "baseline_ms": baseline_ms,
        },
    }))


if __name__ == "__main__":
    main()
