"""The 10M/v5e-8 latency projection (parallel/projection.py).

BASELINE.json config 5 can't run on the attached single chip; the
dryrun prints this projection instead.  These tests pin the model's
shape: anchored stage sum, shard scaling, merge-tree accounting, and
the SLA headroom arithmetic.
"""

import math

import pytest

from advanced_rag_tpu.parallel.projection import (
    MeasuredAnchors,
    project_sharded_retrieve,
)


def test_default_projection_inside_sla():
    out = project_sharded_retrieve()
    assert out["rows"] == 10_000_000 and out["n_shards"] == 8
    assert out["projected_p50_ms"] < out["projected_p99_ms"] < 80.0
    assert out["sla_headroom_x"] == pytest.approx(
        80.0 / out["projected_p99_ms"], rel=1e-2)


def test_stage_sum_is_p50():
    out = project_sharded_retrieve(rows=4_000_000, n_shards=4)
    stages = (out["t_embed_ms"] + out["t_shard_hybrid_ms"]
              + out["t_ici_merge_ms"] + out["t_rerank_ms"]
              + out["t_eval_ms"])
    assert out["projected_p50_ms"] == pytest.approx(stages, abs=0.05)


def test_more_shards_strictly_faster_per_shard():
    one = project_sharded_retrieve(n_shards=1)
    eight = project_sharded_retrieve(n_shards=8)
    assert eight["rows_per_shard"] == one["rows_per_shard"] / 8
    assert eight["t_shard_hybrid_ms"] < one["t_shard_hybrid_ms"]
    assert eight["projected_p50_ms"] < one["projected_p50_ms"]


def test_merge_cost_grows_log2():
    m2 = project_sharded_retrieve(n_shards=2)["t_ici_merge_ms"]
    m8 = project_sharded_retrieve(n_shards=8)["t_ici_merge_ms"]
    m64 = project_sharded_retrieve(n_shards=64)["t_ici_merge_ms"]
    assert m2 < m8 < m64
    # ~0.1 ms per hop dominates; payload bandwidth term is negligible
    assert m8 == pytest.approx(math.log2(8) * 0.1, abs=0.02)


def test_dense_scales_linearly_in_rows():
    a = MeasuredAnchors()
    small = project_sharded_retrieve(rows=1_000_000, n_shards=1, anchors=a)
    big = project_sharded_retrieve(rows=2_000_000, n_shards=1, anchors=a)
    d_small = small["t_shard_hybrid_ms"] - a.fuse_fixed_ms
    d_big = big["t_shard_hybrid_ms"] - a.fuse_fixed_ms
    assert d_big == pytest.approx(2 * d_small, rel=1e-2)


def test_custom_anchors_flow_through():
    a = MeasuredAnchors(embed_ms=1.0, rerank_ms=2.0, eval_host_ms=0.5,
                        jitter_p99_ms=1.0)
    out = project_sharded_retrieve(anchors=a)
    assert out["t_embed_ms"] == 1.0 and out["t_rerank_ms"] == 2.0
    assert out["projected_p99_ms"] == pytest.approx(
        out["projected_p50_ms"] + 1.0, abs=0.02)
