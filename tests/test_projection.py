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


def test_anchors_from_bench_artifact(tmp_path):
    """from_bench maps the round artifact's device stage timings onto
    the projection terms, falling back to defaults for absent keys."""
    import json

    from advanced_rag_tpu.parallel.projection import MeasuredAnchors

    doc = {"parsed": {"value": 40.0, "extra": {
        "corpus_rows": 2_000_000, "p99_ms": 44.0,
        "stage_embed_us_b8": 60.0, "dense_sq8_ms_b8": 1.0,
        "stage_sparse_ms_b8": 0.5, "stage_hybrid_ms_b8": 2.0,
        "stage_rerank_ms_b8": 5.0, "eval_host_ms": 1.0}}}
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(doc))
    a = MeasuredAnchors.from_bench(str(tmp_path))
    assert a.source == "BENCH_r07.json"
    assert a.embed_ms == 0.06
    assert a.dense_sq8_ms_per_mrow == 0.5     # 1.0 ms / 2 Mrow
    assert a.sparse_postings_ms_per_mrow == 0.25
    assert abs(a.fuse_fixed_ms - 0.5) < 1e-9  # 2.0 - 1.0 - 0.5
    assert a.rerank_ms == 5.0 and a.eval_host_ms == 1.0
    assert a.jitter_p99_ms == 4.0


def test_anchors_from_bench_defaults_when_absent(tmp_path):
    from advanced_rag_tpu.parallel.projection import MeasuredAnchors

    a = MeasuredAnchors.from_bench(str(tmp_path))
    assert a == MeasuredAnchors()
