"""RRF / MMR device ops vs the reference's Python semantics
(retrieval.py:421-516): dedup, weighted reciprocal ranks, greedy MMR."""

import jax.numpy as jnp
import numpy as np

from advanced_rag_tpu.ops.dense import NEG_INF
from advanced_rag_tpu.ops.fusion import mmr_select, recency_boost, rrf_fuse


def oracle_rrf(per_method_ids, weights, rrf_k=60):
    scores = {}
    counts = {}
    for m, ids in enumerate(per_method_ids):
        for rank, cid in enumerate(ids):
            if cid < 0:
                continue
            scores[cid] = scores.get(cid, 0.0) + weights[m] / (rrf_k + rank + 1)
            counts[cid] = counts.get(cid, 0) + 1
    order = sorted(scores, key=lambda c: -scores[c])
    return order, scores, counts


def test_rrf_matches_oracle():
    dense = [3, 1, 4, 7, -1]
    sparse = [1, 9, 3, -1, -1]
    ids = jnp.asarray([[dense], [sparse]], dtype=jnp.int32)  # [M=2, Q=1, K=5]
    w = jnp.asarray([0.7, 0.3])
    s, i, c = rrf_fuse(ids, w, rrf_k=60, k_out=6)
    order, oscores, ocounts = oracle_rrf([dense, sparse], [0.7, 0.3])
    got_ids = np.asarray(i)[0].tolist()
    got_s = np.asarray(s)[0]
    got_c = np.asarray(c)[0]
    assert got_ids[: len(order)] == order
    for pos, cid in enumerate(order):
        np.testing.assert_allclose(got_s[pos], oscores[cid], rtol=1e-5)
        assert got_c[pos] == ocounts[cid]
    # padding past the union
    assert got_ids[len(order):] == [-1] * (6 - len(order))
    assert (got_s[len(order):] <= float(NEG_INF)).all()


def test_rrf_dedup_within_method():
    # same id twice in one method: only the best rank should count once per row,
    # i.e. contributions sum over occurrences (matches reference accumulate-then-sort)
    ids = jnp.asarray([[[5, 5, 2, -1]]], dtype=jnp.int32)
    s, i, c = rrf_fuse(ids, jnp.asarray([1.0]), rrf_k=10, k_out=3)
    got = np.asarray(i)[0].tolist()
    assert got[0] == 5 and got[1] == 2
    # id 5 appears once in output despite 2 occurrences
    assert got.count(5) == 1


def test_rrf_batched_queries():
    ids = jnp.asarray(
        [[[1, 2], [3, 4]], [[2, 9], [4, 8]]], dtype=jnp.int32
    )  # [M=2, Q=2, K=2]
    s, i, c = rrf_fuse(ids, jnp.asarray([0.7, 0.3]), k_out=4)
    assert np.asarray(i).shape == (2, 4)
    assert np.asarray(i)[0, 0] in (1, 2)
    assert np.asarray(i)[1, 0] in (3, 4)


def test_mmr_first_pick_is_max_relevance(rng):
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    rel = np.linspace(1.0, 0.1, 8).astype(np.float32)
    sel = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 3))
    assert sel[0] == 0
    assert len(set(sel.tolist())) == 3


def test_mmr_penalizes_duplicates():
    # candidate 1 is an exact duplicate of candidate 0 with slightly lower rel;
    # candidate 2 is orthogonal with much lower rel. MMR must pick 2 over 1.
    emb = np.array([[1, 0], [1, 0], [0, 1]], dtype=np.float32)
    rel = np.array([1.0, 0.99, 0.30], dtype=np.float32)
    sel = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 2,
                                lambda_mult=0.5))
    assert sel.tolist() == [0, 2]


def test_mmr_respects_valid_and_pads():
    emb = np.eye(4, dtype=np.float32)
    rel = np.array([0.9, 0.8, 0.7, 0.6], dtype=np.float32)
    valid = np.array([True, False, True, False])
    sel = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 4,
                                valid=jnp.asarray(valid)))
    assert sel[0] == 0 and sel[1] == 2
    assert (sel[2:] == -1).all()


def test_mmr_rrf_scale_keeps_relevant_docs():
    """RRF scores have ~1/rrf_k dynamic range; MMR must min-max the
    relevance before blending or the similarity penalty dominates and
    off-topic docs win from rank 2 (observed on a 2-topic corpus:
    4/10 on-topic at lambda=0.8 where the fused order was 10/10)."""
    rng = np.random.default_rng(0)
    topic = rng.standard_normal((1, 8)).astype(np.float32)
    other = rng.standard_normal((1, 8)).astype(np.float32)
    # 6 near-duplicate on-topic candidates, 4 clearly off-topic
    emb = np.concatenate([
        topic + 0.05 * rng.standard_normal((6, 8)).astype(np.float32),
        other + 0.05 * rng.standard_normal((4, 8)).astype(np.float32)])
    # RRF-scale relevance: on-topic docs rank 1..6, off-topic 7..10
    rel = np.asarray([1.0 / (60 + r) for r in range(1, 11)], np.float32)
    sel = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 6,
                                lambda_mult=0.8))
    # top pick is pure relevance; near-dupes may legitimately cede ONE
    # late slot to diversity, but the raw-scale failure mode (off-topic
    # from rank 2, only 4/10 on-topic) must be gone
    assert sel[0] == 0
    on_topic = sum(1 for s in sel.tolist() if s < 6)
    assert on_topic >= 5, sel


def test_recency_boost_halves_per_half_life():
    now = jnp.float32(86400.0 * 60)
    ts = jnp.asarray([86400.0 * 60, 86400.0 * 30, 0.0], dtype=jnp.float32)
    out = np.asarray(recency_boost(ts, now, jnp.float32(30.0)))
    np.testing.assert_allclose(out, [1.0, 0.5, 0.25], rtol=1e-5)
