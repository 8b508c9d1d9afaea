"""Stage attribution of the 10M-row single-chip e2e latency.

BENCH_r04: 10M e2e p50 72.1 / p99 80.5 ms vs the 80 ms SLA — ~5 ms of
headroom to buy back (VERDICT r4 next #5).  The 1M e2e p50 is 29.6 ms
with ~25 ms of that being tunnel RTT + host work, so the 10M leg adds
~42 ms of device time; the known O(N) stages (SQ8 scan 6.4 GB ≈ 9 ms at
HBM peak, postings scatter, top-k passes) only explain ~15.  This
script stages the SAME synthetic 10M corpus as bench.py and times each
stage with the chained/scanned device-true helpers (utils/timing.py),
so the residual is attributable instead of guessed.

Usage: python scripts/profile_10m.py [--rows 10000000]
Prints one JSON line with per-stage ms.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from advanced_rag_tpu.models.encoder import (
        EncoderConfig, init_bi_encoder, init_cross_encoder)
    from advanced_rag_tpu.models.tokenizer import (
        HashingTokenizer, TokenizerConfig)
    from advanced_rag_tpu.ops import make_retrieve_rerank
    from advanced_rag_tpu.ops.hybrid import hybrid_retrieve
    from advanced_rag_tpu.ops.quant import sq8_quantize
    from advanced_rag_tpu.ops.rescore import exact_tier_scores_postings
    from advanced_rag_tpu.utils.timing import chained_ms

    n = args.rows
    d = 384
    vocab, nnz, ld, lq = 16384, 64, 47, 32
    cap = max(4096, -(-n * nnz // vocab) + 1023 & ~1023)
    n_alloc = -(-n // 16384) * 16384
    out: dict = {"rows": n, "postings_cap": cap, "n_alloc": n_alloc}

    print("staging corpus...", flush=True)
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    @jax.jit
    def _chunk_codes(ck):
        e = jax.random.normal(ck, (2_500_000 if n >= 2_500_000 else n, d),
                              jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return sq8_quantize(e)

    chunk = 2_500_000 if n >= 2_500_000 else n
    parts = [_chunk_codes(ck)
             for ck in jax.random.split(k1, -(-n_alloc // chunk))]
    codes = jnp.concatenate([p[0] for p in parts], axis=0)[:n_alloc]
    scale = jnp.concatenate([p[1] for p in parts], axis=0)[:n_alloc]
    del parts
    post_rows = jax.random.randint(k2, (vocab, cap), 0, n, jnp.int32)
    post_tf = (1.0 + jax.random.uniform(k3, (vocab, cap))).astype(jnp.bfloat16)
    doc_tokens = jax.random.randint(k4, (n_alloc, ld), 8, 32768,
                                    jnp.int32).astype(jnp.uint16)
    df = jax.random.randint(k5, (vocab,), 1, max(n // 10, 2), jnp.int32)
    doc_len = jnp.full((n_alloc,), 1.5 * nnz, jnp.float32)
    valid = jnp.arange(n_alloc) < n
    dummy_idx = jnp.zeros((n_alloc, 1), jnp.int32)
    dummy_tf = jnp.zeros((n_alloc, 1), jnp.float32)
    n_dev = jnp.float32(n)
    jax.device_get((codes[:1, :1], doc_tokens[:1, :1]))
    out["stage_s"] = round(time.perf_counter() - t0, 1)
    print(f"staged in {out['stage_s']}s", flush=True)

    enc_cfg = EncoderConfig(max_len=lq + ld + 1)
    bi, p_bi = init_bi_encoder(enc_cfg, out_dim=d, seed=0)
    ce, p_ce = init_cross_encoder(enc_cfg, seed=1)
    tok = HashingTokenizer(TokenizerConfig(max_len=lq))
    weights = jnp.asarray([0.7, 0.3], jnp.float32)
    alpha_dev = jnp.float32(0.25)
    mix_dev = jnp.float32(0.5)
    mmr_dev = jnp.float32(0.8)
    rng = np.random.default_rng(1)

    def encode_queries(b):
        texts = [" ".join(f"w{rng.integers(0, 30000)}" for _ in range(9))
                 for _ in range(b)]
        q_ids, q_mask = tok.encode_batch(texts)
        q_idx = (q_ids[:, 1:17].astype(np.int64) * 2654435761 % vocab
                 ).astype(np.int32)
        q_tf = np.ones_like(q_idx, np.float32)
        return (jnp.asarray(q_ids), jnp.asarray(q_mask),
                jnp.asarray(q_idx), jnp.asarray(q_tf))

    program = make_retrieve_rerank(
        bi, ce, k_cand=40, k_out=24, k_rerank=20, k_final=5,
        dense_impl="sq8", sparse_impl="postings", use_mmr=True,
        rerank_mode="residual", rerank_base="exact_postings")

    def run_e2e(a):
        return program(p_bi, p_ce, *a, doc_tokens, codes, dummy_idx,
                       dummy_tf, doc_len, df, n_dev, valid, weights,
                       mmr_dev, post_rows=post_rows, post_tf=post_tf,
                       emb_scale=scale, rerank_alpha=alpha_dev,
                       rescore_mix=mix_dev)

    args1 = encode_queries(1)
    jax.block_until_ready(run_e2e(args1).ids)
    print("e2e compiled", flush=True)

    def perturb(a, eps):
        q_ids, q_mask, q_idx, q_tf = a
        return (q_ids + eps.astype(jnp.int32), q_mask, q_idx, q_tf)

    # full e2e, chained (pure device time, no per-call host dispatch)
    out["e2e_chained_ms"] = round(chained_ms(
        lambda i, eps: run_e2e(perturb(args1, eps)).ids,
        rounds=args.iters), 2)
    print("e2e", out["e2e_chained_ms"], flush=True)

    qv = jax.random.normal(jax.random.PRNGKey(7), (1, d), jnp.float32)
    _, _, qi1, qt1 = args1

    # dense sq8 scan + topk alone (the rung the hybrid picks at 10M)
    from advanced_rag_tpu.ops.quant import dense_topk_sq8_approx

    # arrays as ARGUMENTS, never closure captures: jit constant-folds
    # captured device arrays, and "compiling" a 6.4 GB constant wedges
    # the tunnel-side compile for tens of minutes
    dt = jax.jit(lambda cd, sc, v, q: dense_topk_sq8_approx(
        cd, sc, q, 40, v, metric="ip",
        normalize_queries=False)[1])
    jax.block_until_ready(dt(codes, scale, valid, qv))
    out["dense_sq8_chained_ms"] = round(chained_ms(
        lambda i, eps: dt(codes, scale, valid, qv + eps),
        rounds=args.iters), 2)
    print("dense", out["dense_sq8_chained_ms"], flush=True)

    # sparse postings alone
    from advanced_rag_tpu.ops.postings import postings_topk

    sp = jax.jit(lambda pr, pt, dl, df_, v, qi, qt: postings_topk(
        pr, pt, dl, df_, n_dev, qi, qt, 40,
        valid=v)[1])
    try:
        jax.block_until_ready(sp(post_rows, post_tf, doc_len, df,
                                 valid, qi1, qt1))
        out["sparse_postings_chained_ms"] = round(chained_ms(
            lambda i, eps: sp(post_rows, post_tf, doc_len, df, valid,
                              qi1 + (eps * 0).astype(jnp.int32), qt1),
            rounds=args.iters), 2)
    except Exception as exc:
        out["sparse_postings_error"] = str(exc)[:120]
    print("sparse", out.get("sparse_postings_chained_ms"), flush=True)

    # exact_postings rescore alone (K=20 slate)
    cand = jnp.asarray(rng.integers(0, n, (1, 20)), jnp.int32)
    rs = jax.jit(lambda c, q, qi, qt, cd, pr, pt, dl, df_, v, sc:
                 exact_tier_scores_postings(
                     c, q, qi, qt, cd, pr, pt, dl, df_, n_dev,
                     valid=v, emb_scale=sc)[0])
    rs_args = (codes, post_rows, post_tf, doc_len, df, valid, scale)
    jax.block_until_ready(rs(cand, qv, qi1, qt1, *rs_args))
    out["rescore_postings_chained_ms"] = round(chained_ms(
        lambda i, eps: rs(cand, qv + eps, qi1, qt1, *rs_args),
        rounds=args.iters), 2)
    print("rescore", out["rescore_postings_chained_ms"], flush=True)

    # hybrid only (no CE, no rescore): same statics, alpha path off
    hyb = jax.jit(lambda cd, dl, df_, v, sc, pr, pt, q, qi, qt:
                  hybrid_retrieve(
                      cd, dummy_idx, dummy_tf, dl, df_, n_dev,
                      q, qi, qt, v, weights, mmr_dev,
                      post_rows=pr, post_tf=pt, emb_scale=sc,
                      k_cand=40, k_out=24, metric="ip", dense_impl="sq8",
                      sparse_impl="postings", use_mmr=True,
                      rrf_k=60).ids)
    hy_args = (codes, doc_len, df, valid, scale, post_rows, post_tf)
    jax.block_until_ready(hyb(*hy_args, qv, qi1, qt1))
    out["hybrid_chained_ms"] = round(chained_ms(
        lambda i, eps: hyb(*hy_args, qv + eps, qi1, qt1),
        rounds=args.iters), 2)
    print("hybrid", out["hybrid_chained_ms"], flush=True)

    # hybrid WITHOUT mmr (same rungs): isolates the MMR gather/compare
    hyb2 = jax.jit(lambda cd, dl, df_, v, sc, pr, pt, q, qi, qt:
                   hybrid_retrieve(
                       cd, dummy_idx, dummy_tf, dl, df_, n_dev,
                       q, qi, qt, v, weights, mmr_dev,
                       post_rows=pr, post_tf=pt, emb_scale=sc,
                       k_cand=40, k_out=24, metric="ip",
                       dense_impl="sq8", sparse_impl="postings",
                       use_mmr=False, rrf_k=60).ids)
    jax.block_until_ready(hyb2(*hy_args, qv, qi1, qt1))
    out["hybrid_nommr_chained_ms"] = round(chained_ms(
        lambda i, eps: hyb2(*hy_args, qv + eps, qi1, qt1),
        rounds=args.iters), 2)
    print("hybrid_nommr", out["hybrid_nommr_chained_ms"], flush=True)

    # dense-only hybrid (enable_sparse=False): dense rung + RRF + MMR
    hyb3 = jax.jit(lambda cd, dl, df_, v, sc, q, qi, qt:
                   hybrid_retrieve(
                       cd, dummy_idx, dummy_tf, dl, df_, n_dev,
                       q, qi, qt, v, weights, mmr_dev,
                       emb_scale=sc,
                       k_cand=40, k_out=24, metric="ip",
                       dense_impl="sq8", sparse_impl="xla",
                       enable_sparse=False,
                       use_mmr=True, rrf_k=60).ids)
    hy3_args = (codes, doc_len, df, valid, scale)
    jax.block_until_ready(hyb3(*hy3_args, qv, qi1, qt1))
    out["hybrid_nosparse_chained_ms"] = round(chained_ms(
        lambda i, eps: hyb3(*hy3_args, qv + eps, qi1, qt1),
        rounds=args.iters), 2)
    print("hybrid_nosparse", out["hybrid_nosparse_chained_ms"],
          flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
