"""Latency projection for the sharded 10M-row / v5e-8 configuration.

BASELINE.json config 5 (10M chunks sharded over v5e-8 with ICI top-k
reduction) cannot be *run* here — one chip is attached — so the dryrun
carries an explicit, assumption-stated projection instead, anchored to
single-chip measurements from the round bench (bench.py at 1M).

Model (Q=1 retrieve, SQ8 dense + postings BM25 + RRF/MMR + CE rerank):

  t_total = t_embed + max_shard(t_dense + t_sparse + t_fuse) + t_merge
            + t_rerank + t_eval

- t_dense scales linearly in rows/shard from the measured 1M figure
  (the SQ8 scan is HBM-bandwidth-bound; each shard scans privately).
- t_sparse uses the postings kernel, whose cost scales with postings
  capacity per shard (~rows/shard), from the measured 1M figure.
- t_fuse (RRF + MMR + dispatch overhead) is shape-fixed per shard.
- t_merge: a log2(S)-hop ppermute tree moving Q*k (id, score) pairs
  (8 B each) per hop over ICI (~45 GB/s/link, ~1 us/hop) — bandwidth
  is negligible, latency budgeted at 0.1 ms/hop conservatively.
- t_embed / t_rerank / t_eval are corpus-independent single-chip
  numbers.
- Tunnel RTT (~25 ms on this dev chip, BACKLOG r1 #3) is EXCLUDED:
  a v5e-8 pod host drives its chips locally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict


@dataclass(frozen=True)
class MeasuredAnchors:
    """Single-chip measurements the projection extrapolates from
    (defaults = round-2 bench at 1M x 384 on v5e, batch-1 figures;
    ``from_bench`` re-derives them from the newest round artifact —
    VERDICT r3 next #7)."""

    embed_ms: float = 3.6          # MiniLM-L6 bi-encoder forward
    dense_sq8_ms_per_mrow: float = 3.4   # SQ8 scan+topk per 1M rows
    sparse_postings_ms_per_mrow: float = 0.25
    fuse_fixed_ms: float = 5.5     # RRF + MMR + program overhead
    rerank_ms: float = 6.0         # CE over 20 pairs (seq 80)
    eval_host_ms: float = 1.5
    jitter_p99_ms: float = 4.0     # measured p99 - p50 spread at 1M
    source: str = "defaults (round-2 bench)"

    @classmethod
    def from_bench(cls, search_dir=None) -> "MeasuredAnchors":
        """Anchors from the newest ``BENCH_r*.json`` driver artifact.

        Maps the bench's scan-chained DEVICE stage timings (bench.py
        "extra") onto the projection terms; any key a given round did
        not emit falls back to the dataclass default.  Returns the
        defaults unchanged when no artifact exists (fresh checkout)."""
        import glob
        import json
        import os

        base = search_dir or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        paths = sorted(glob.glob(os.path.join(base, "BENCH_r*.json")))
        for path in reversed(paths):
            try:
                with open(path) as fh:
                    doc = json.load(fh)
                ex = (doc.get("parsed") or doc).get("extra") or {}
                p50 = (doc.get("parsed") or doc).get("value")
            except (OSError, json.JSONDecodeError, AttributeError):
                continue
            if not ex:
                continue
            mrow = max(ex.get("corpus_rows", 1_000_000), 1) / 1e6
            kw = {"source": os.path.basename(path)}
            if "stage_embed_us_b8" in ex:
                kw["embed_ms"] = max(ex["stage_embed_us_b8"] / 1e3, 0.01)
            if "dense_sq8_ms_b8" in ex:
                kw["dense_sq8_ms_per_mrow"] = ex["dense_sq8_ms_b8"] / mrow
            if "stage_sparse_ms_b8" in ex:
                kw["sparse_postings_ms_per_mrow"] = (
                    ex["stage_sparse_ms_b8"] / mrow)
            if ("stage_hybrid_ms_b8" in ex and "dense_sq8_ms_b8" in ex):
                kw["fuse_fixed_ms"] = max(
                    ex["stage_hybrid_ms_b8"] - ex["dense_sq8_ms_b8"]
                    - ex.get("stage_sparse_ms_b8", 0.0), 0.2)
            if "stage_rerank_ms_b8" in ex:
                kw["rerank_ms"] = ex["stage_rerank_ms_b8"]
            if "eval_host_ms" in ex:
                kw["eval_host_ms"] = ex["eval_host_ms"]
            if "p99_ms" in ex and isinstance(p50, (int, float)):
                kw["jitter_p99_ms"] = max(ex["p99_ms"] - p50, 0.5)
            return cls(**kw)
        return cls()


def project_sharded_retrieve(
    rows: int = 10_000_000,
    n_shards: int = 8,
    anchors: MeasuredAnchors = MeasuredAnchors(),
    k: int = 20,
    q: int = 1,
) -> Dict[str, float]:
    rows_per_shard = rows / n_shards
    mrow = rows_per_shard / 1e6
    t_dense = anchors.dense_sq8_ms_per_mrow * mrow
    t_sparse = anchors.sparse_postings_ms_per_mrow * mrow
    t_shard = t_dense + t_sparse + anchors.fuse_fixed_ms
    import math

    hops = max(1, math.ceil(math.log2(n_shards)))
    payload_bytes = q * k * 8 * hops
    t_merge = hops * 0.1 + payload_bytes / 45e9 * 1e3
    p50 = (anchors.embed_ms + t_shard + t_merge + anchors.rerank_ms
           + anchors.eval_host_ms)
    return {
        "rows": rows,
        "n_shards": n_shards,
        "rows_per_shard": rows_per_shard,
        "t_embed_ms": round(anchors.embed_ms, 2),
        "t_shard_hybrid_ms": round(t_shard, 2),
        "t_ici_merge_ms": round(t_merge, 2),
        "t_rerank_ms": round(anchors.rerank_ms, 2),
        "t_eval_ms": round(anchors.eval_host_ms, 2),
        "projected_p50_ms": round(p50, 2),
        "projected_p99_ms": round(p50 + anchors.jitter_p99_ms, 2),
        "sla_ms": 80.0,
        "sla_headroom_x": round(80.0 / (p50 + anchors.jitter_p99_ms), 2),
    }


__all__ = ["MeasuredAnchors", "project_sharded_retrieve"]
