"""HNSW recall parity at equal memory — the north-star measurement.

BASELINE.json defines quality as "recall@10 vs HNSW at equal memory".
The reference never measures it (Milvus HNSW quality is assumed from
its knobs, indexing.py:150-153).  This script measures it directly:

  1. Build the in-repo clean-room HNSW (baselines/hnsw.py) at the
     reference's knobs (M=16, efConstruction=200, ef=64).
  2. Build our device tiers over the SAME corpus: IVF (bf16, SQ8) with
     nprobe auto-tuned, and IVF-PQ (the >30M-rows/chip tier).
  3. Score recall@10 against the exact f32 oracle, count bytes/row for
     each, and report side by side — including a 1536-dim variant (the
     reference's semantic dim, indexing.py:92).

Corpora: "uniform" (hard for graph+quantizer alike) and "clustered"
(the regime real embeddings live in).  Writes PARITY_HNSW.json.

Usage: python scripts/bench_hnsw_parity.py [--n 200000] [--quick]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import time
from pathlib import Path

import numpy as np


def make_corpus(kind: str, n: int, d: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "uniform":
        v = rng.standard_normal((n, d)).astype(np.float32)
    else:  # clustered: many tight clusters, the embedding-like regime
        n_clusters = max(256, n // 500)
        centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_clusters, n)
        v = centers[assign] + 0.15 * rng.standard_normal((n, d)).astype(
            np.float32)
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def make_realistic(n: int, seed: int):
    """-> (corpus [n, 256], queries) on a REAL embedding manifold.

    Round-2's synthetic corpora were pathologically hostile to graph
    indexes (HNSW at ef=64 collapsed to 0.18-0.45 recall on iid noise —
    VERDICT r2 weak #2), which flatters our tiers.  Here the manifold is
    real: a bi-encoder contrastively trained in-framework on harvested
    docstrings embeds the 8k-passage corpus, and the corpus is grown to
    ``n`` by SPHERICAL INTERPOLATION between each real point and one of
    its true nearest neighbors (plus small noise) — new points live ON
    the local manifold, preserving the cluster geometry and hubness
    statistics that make ANN easy-or-hard, unlike iid perturbations.
    Queries are the trained embeddings of real summary-line queries.
    Cached to /tmp (deterministic given seed) because the bi-encoder
    train + augmentation is minutes of work a tunnel drop must not
    repeat.
    """
    cache = Path(f"/tmp/realistic_{n}_{seed}.npz")
    if cache.exists():
        blob = np.load(cache)
        return blob["v"], blob["q"]

    import jax.numpy as jnp

    from scripts.bench_quality_real import harvest_docstrings
    from advanced_rag_tpu.models.embedder import NeuralEmbedder
    from advanced_rag_tpu.models.encoder import EncoderConfig, init_bi_encoder
    from advanced_rag_tpu.models.tokenizer import (HashingTokenizer,
                                                   TokenizerConfig)
    from advanced_rag_tpu.train import (TrainConfig, build_train_mesh,
                                        make_optimizer, make_train_step)

    docs = harvest_docstrings(8000)
    bodies = [d_[2] for d_ in docs]
    summaries = [d_[1] for d_ in docs]
    enc_cfg = EncoderConfig(vocab_size=32768, hidden_dim=128, num_layers=4,
                            num_heads=4, mlp_dim=512, max_len=128)
    tok = HashingTokenizer(TokenizerConfig(vocab_size=32768, max_len=128))
    tcfg = TrainConfig(learning_rate=5e-4, warmup_steps=50, total_steps=1500)
    mesh = build_train_mesh(1, tcfg)
    model, params = init_bi_encoder(enc_cfg, out_dim=256, seed=0)
    step, params, opt_state = make_train_step(
        model, make_optimizer(tcfg), tcfg, mesh, params)
    pq_ids, pq_mask = tok.encode_batch(summaries, 128)
    pd_ids, pd_mask = tok.encode_batch(bodies, 128)
    rng = np.random.default_rng(seed)
    for _ in range(tcfg.total_steps):
        sel = rng.integers(0, len(docs), 128)
        batch = {"q_ids": jnp.asarray(pq_ids[sel]),
                 "q_mask": jnp.asarray(pq_mask[sel]),
                 "d_ids": jnp.asarray(pd_ids[sel]),
                 "d_mask": jnp.asarray(pd_mask[sel])}
        params, opt_state, _m = step(params, opt_state, batch)
    emb = NeuralEmbedder(dim=256, config=enc_cfg, params=params,
                         tokenizer=tok)
    base = emb.encode(bodies).astype(np.float32)          # [8k, 256], L2=1
    queries = emb.encode(summaries[:256]).astype(np.float32)

    # true top-8 neighbor lists of the base points (exact, tiny)
    sims = base @ base.T
    np.fill_diagonal(sims, -np.inf)
    nbrs = np.argpartition(-sims, 8, axis=1)[:, :8]       # [8k, 8]

    m = len(base)
    out = np.empty((n, base.shape[1]), np.float32)
    out[:m] = base
    bs = 100_000
    for s0 in range(m, n, bs):
        s1 = min(s0 + bs, n)
        cnt = s1 - s0
        i = rng.integers(0, m, cnt)
        j = nbrs[i, rng.integers(0, 8, cnt)]
        lam = rng.uniform(0.0, 0.35, (cnt, 1)).astype(np.float32)
        v = base[i] * (1 - lam) + base[j] * lam
        v += 0.02 * rng.standard_normal(v.shape).astype(np.float32)
        out[s0:s1] = v
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    queries /= np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    np.savez(cache, v=out, q=queries)
    return out, queries


def exact_oracle(v: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
    # float32 brute force in blocks (host RAM-friendly at 1M rows);
    # recall() is set-based so top-k order does not matter
    out = np.empty((len(q), k), np.int64)
    for s in range(0, len(q), 32):
        scores = q[s:s + 32] @ v.T                    # [<=32, N]
        out[s:s + 32] = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    return out


def recall(ids: np.ndarray, oracle: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(ids[r][ids[r] >= 0].tolist()) & set(oracle[r].tolist())) / k
        for r in range(len(oracle))]))


def run_config(kind: str, n: int, d: int, nq: int, k: int,
               quick: bool) -> dict:
    import jax.numpy as jnp

    from advanced_rag_tpu.baselines import HNSWBaseline
    from advanced_rag_tpu.config import IndexConfig
    from advanced_rag_tpu.index.dense_index import DenseIndex

    tune_q = None   # held-out REAL queries for nprobe tuning (never the
    #                 eval set): self-query tuning under-delivers on
    #                 off-corpus queries (dense_index.tune_nprobe note)
    if kind == "realistic":
        v, q_all = make_realistic(n, seed=0)
        d = v.shape[1]
        q = np.ascontiguousarray(q_all[:nq])
        if len(q_all) > nq:
            tune_q = np.ascontiguousarray(q_all[nq:])
    else:
        v = make_corpus(kind, n, d, seed=0)
        rng = np.random.default_rng(1)
        q = v[rng.integers(0, n, nq)] + 0.05 * rng.standard_normal(
            (nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        tune_q = v[rng.integers(0, n, nq)] + 0.05 * rng.standard_normal(
            (nq, d)).astype(np.float32)
        tune_q /= np.linalg.norm(tune_q, axis=1, keepdims=True)
    oracle = exact_oracle(v, q, k)
    out = {"corpus": kind, "n": n, "dim": d, "queries": len(q), "k": k,
           "tiers": {}}
    nq = len(q)

    # -- HNSW baseline (reference knobs) --------------------------------
    # cached per (kind, n, d, nq): a 100k build is ~30 min of
    # single-core CPU, too costly to redo after a tunnel drop kills the
    # device tiers mid-run (corpus/queries are seeded => deterministic)
    cache = Path(f"/tmp/hnsw_tier_{kind}_{n}_{d}_{nq}.json")
    if cache.exists():
        out["tiers"]["hnsw_m16_ef64"] = json.loads(cache.read_text())
        print("  (hnsw tier from cache)", flush=True)
    else:
        graph_cache = (Path(f"/tmp/hnsw_graph_{kind}_{n}_{d}.bin")
                       if n >= 300_000 else None)
        t0 = time.perf_counter()
        h = HNSWBaseline(v, M=16, ef_construction=200,
                         cache_path=graph_cache)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, ids = h.search(q, k, ef=64, normalize=False)
        ms_q = (time.perf_counter() - t0) / nq * 1e3
        out["tiers"]["hnsw_m16_ef64"] = {
            "recall_at_10": round(recall(ids, oracle, k), 4),
            "bytes_per_row": round(h.memory_bytes() / n, 1),
            "build_s": round(build_s, 1),
            "cpu_ms_per_query": round(ms_q, 3),
        }
        del h
        cache.write_text(json.dumps(out["tiers"]["hnsw_m16_ef64"]))

    # -- our tiers ------------------------------------------------------
    def tier(name: str, dtype: str, ivf: bool, pq: bool = False):
        cfg = IndexConfig(dim=d, dtype=dtype, min_capacity=1024)
        idx = DenseIndex(cfg)
        t0 = time.perf_counter()
        idx.bulk_load(v, pre_normalized=True)
        if pq:
            idx.build_pq()
            idx.build_ivfpq()
        elif ivf:
            idx.build_ivf()
        if ivf or pq:
            npb, tuned = idx.tune_nprobe(recall_target=0.95, k=k,
                                         sample=32 if quick else 64,
                                         queries=tune_q)
        build_s = time.perf_counter() - t0
        import jax as _jax

        # warm-up: the first call compiles (~10-40 s on chip) and must
        # not pollute the latency column (VERDICT r2 weak #3: the old
        # columns were CPU-fallback garbage).  Every timed call BLOCKS
        # on the result — async dispatch times under-measured the bf16
        # tiers by the full ~25 ms tunnel RTT while the quantized
        # tiers' host-refine sync paid it, making columns incomparable.
        _jax.block_until_ready(idx.search(q[:8], k))
        _jax.block_until_ready(idx.search(q, k))   # warm the full-nq shape
        t0 = time.perf_counter()
        reps = 0
        for s in range(0, min(nq, 64), 8):
            _jax.block_until_ready(idx.search(q[s:s + 8], k))
            reps += 8
        ms_q_b8 = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        _, ids = idx.search(q, k)
        _jax.block_until_ready(ids)
        ms_q = (time.perf_counter() - t0) / nq * 1e3

        entry = {
            "recall_at_10": round(recall(np.asarray(ids), oracle, k), 4),
            "bytes_per_row": round(idx.memory_bytes() / n, 1),
            "build_s": round(build_s, 1),
            "device_ms_per_query_b8": round(ms_q_b8, 3),
            f"device_ms_per_query_b{nq}": round(ms_q, 3),
            "backend": _jax.default_backend(),
        }
        if ivf or pq:
            entry["nprobe"] = int(idx.config.nprobe)
        out["tiers"][name] = entry
        del idx

    tier("exact_bf16", "bfloat16", ivf=False)
    # exact int8 scan: the memory-parity headline tier — ~1/4 of HNSW's
    # bytes/row at near-exact recall, still a single fused device scan
    tier("exact_sq8", "int8", ivf=False)
    tier("ivf_bf16", "bfloat16", ivf=True)
    tier("ivf_sq8", "int8", ivf=True)
    if not quick:
        tier("ivfpq", "pq", ivf=False, pq=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--realistic-n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="skip IVF-PQ and shrink tuning samples")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (recall numbers are "
                         "backend-independent; per-query ms is not)")
    args = ap.parse_args()
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # resume: configs already in PARITY_HNSW.json are kept as-is (a
    # prior run's 30-min HNSW builds / hour-long CPU-fallback tiers
    # must survive tunnel drops and timeouts)
    out_path = Path("PARITY_HNSW.json")
    results = []
    if out_path.exists():
        try:
            results = json.loads(out_path.read_text())
        except Exception:
            results = []
    done = {(r["corpus"], r["n"], r["dim"]) for r in results}
    # "realistic" is the north-star row (BASELINE.md: 1M-10M chunks on
    # a real embedding manifold); dim is set by the trained bi-encoder
    configs = [("realistic", args.realistic_n, 256),
               ("clustered", args.n, 384), ("uniform", args.n, 384),
               ("clustered", max(args.n // 4, 20_000), 1536)]
    for kind, n, d in configs:
        if (kind, n, d) in done:
            print(f"== {kind} n={n} d={d} == (resumed from json)",
                  flush=True)
            continue
        print(f"== {kind} n={n} d={d} ==", flush=True)
        r = run_config(kind, n, d, args.nq, 10, args.quick)
        results.append(r)
        for tname, t in r["tiers"].items():
            print(f"  {tname:14s} recall@10={t['recall_at_10']:.3f}  "
                  f"{t['bytes_per_row']:7.1f} B/row  build {t['build_s']}s",
                  flush=True)
        # checkpoint after every config: an HNSW build is ~30 min of
        # single-core CPU, and a tunnel drop mid-run must not lose it
        out_path.write_text(json.dumps(results, indent=1))
    print("-> PARITY_HNSW.json")


if __name__ == "__main__":
    main()
