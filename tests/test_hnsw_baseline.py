"""baselines/hnsw.py — the clean-room HNSW used for parity benchmarks.

Not a serving component: these tests pin build/search correctness so
the parity numbers (scripts/bench_hnsw_parity.py) rest on a sound
baseline.  CPU-only (no device work).
"""

import numpy as np
import pytest

from advanced_rag_tpu.baselines import hnsw as hnsw_mod
from advanced_rag_tpu.baselines import HNSWBaseline

pytestmark = pytest.mark.skipif(
    not hnsw_mod.available(), reason="g++ unavailable for hnsw_native")


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    n, d = 5000, 48
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v, HNSWBaseline(v, M=16, ef_construction=200, seed=1)


def test_self_query_exact(built):
    v, h = built
    _, ids = h.search(v[:32], 1, ef=64, normalize=False)
    assert (ids[:, 0] == np.arange(32)).mean() >= 0.95


def test_recall_vs_exact_oracle(built):
    v, h = built
    rng = np.random.default_rng(2)
    q = v[rng.integers(0, len(v), 64)] + 0.03 * rng.standard_normal(
        (64, v.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(q @ v.T), axis=1)[:, :10]
    _, ids = h.search(q, 10, ef=64, normalize=False)
    rec = np.mean([len(set(ids[r]) & set(oracle[r])) / 10
                   for r in range(64)])
    assert rec >= 0.85, rec          # M=16/ef=64 on 5k uniform: ~0.95


def test_higher_ef_never_worse(built):
    v, h = built
    rng = np.random.default_rng(3)
    q = rng.standard_normal((32, v.shape[1])).astype(np.float32)
    oracle = np.argsort(-((q / np.linalg.norm(q, axis=1, keepdims=True))
                          @ v.T), axis=1)[:, :10]
    recs = []
    for ef in (16, 64, 256):
        _, ids = h.search(q, 10, ef=ef)
        recs.append(np.mean([len(set(ids[r]) & set(oracle[r])) / 10
                             for r in range(32)]))
    assert recs[2] >= recs[0] - 0.02   # monotone-ish in ef
    assert recs[2] >= 0.9


def test_scores_sorted_and_ids_unique(built):
    v, h = built
    s, ids = h.search(v[:8], 20, ef=64, normalize=False)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    for r in range(8):
        real = ids[r][ids[r] >= 0]
        assert len(set(real.tolist())) == len(real)


def test_memory_accounting(built):
    v, h = built
    n, d = v.shape
    assert h.memory_bytes() >= n * d * 4        # at least the vectors
    # graph: <= M0 int32 links per node at level 0 + upper levels
    assert h.graph_bytes() <= n * (2 * 16 * 4 * 2 + 8)


def test_k_larger_than_ef_and_corpus():
    rng = np.random.default_rng(5)
    v = rng.standard_normal((50, 16)).astype(np.float32)
    h = HNSWBaseline(v, M=8, ef_construction=50)
    s, ids = h.search(v[:2], 60, ef=4)  # k > n and k > ef
    assert ids.shape == (2, 60)
    real = ids[0][ids[0] >= 0]
    assert len(set(real.tolist())) == len(real)
