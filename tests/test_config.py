"""Config loading (YAML overlay onto dataclasses) + profiling helpers."""

import textwrap

import pytest

from advanced_rag_tpu.config import (
    Metric,
    PipelineConfig,
    load_component_configs,
    load_pipeline_config,
    load_yaml_config,
)
from advanced_rag_tpu.utils.profiling import StageTimer


@pytest.fixture
def config_file(tmp_path):
    path = tmp_path / "config.yaml"
    path.write_text(textwrap.dedent("""
        pipeline:
          target_latency_ms: 120.0
          top_k: 10
          enable_domain: true
          unknown_key_is_ignored: 42
        retrieval:
          dense_weight: 0.6
          sparse_weight: 0.4
          use_mmr: false
        mesh:
          mesh_shape: [4, 2]
        index:
          metric: ip
          nprobe: 16
        security:
          api_key: sekrit
    """))
    return path


def test_load_pipeline_config(config_file):
    cfg = load_pipeline_config(config_file)
    assert cfg.target_latency_ms == 120.0
    assert cfg.top_k == 10
    assert cfg.enable_domain is True
    # nested sections overlay
    assert cfg.retrieval.dense_weight == 0.6
    assert cfg.retrieval.use_mmr is False
    assert tuple(cfg.mesh.mesh_shape) == (4, 2)
    # defaults preserved for untouched fields
    assert cfg.rerank_top_k == PipelineConfig().rerank_top_k


def test_component_sections(config_file):
    sections = load_component_configs(config_file)
    assert sections["index"]["metric"] == "ip"
    assert sections["security"]["api_key"] == "sekrit"
    assert sections["chunking"] == {}


def test_yaml_root_must_be_mapping(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("- just\n- a\n- list\n")
    with pytest.raises(ValueError):
        load_yaml_config(bad)


def test_enum_coercion(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text("pipeline: {}\n")
    cfg = load_pipeline_config(path)
    assert isinstance(PipelineConfig().retrieval.dense_weight, float)
    assert Metric("ip") == Metric.INNER_PRODUCT
    assert cfg is not None


def test_stage_timer_window():
    st = StageTimer(window=3)
    for _ in range(5):
        with st.stage("x"):
            pass
    rep = st.report()
    assert rep["x"]["count"] == 3
    assert rep["x"]["p50"] >= 0


def test_replace_does_not_mutate_nested_retrieval():
    """dataclasses.replace shares the nested RetrievalConfig; the
    __post_init__ MMR combine must not write through to the ORIGINAL
    config's retrieval (ADVICE r4: replace(cfg, enable_mmr=False) used
    to flip cfg.retrieval.use_mmr on the source instance too)."""
    import dataclasses

    cfg = PipelineConfig()
    assert cfg.retrieval.use_mmr is True
    off = dataclasses.replace(cfg, enable_mmr=False)
    assert off.retrieval.use_mmr is False
    # the source config is untouched
    assert cfg.retrieval.use_mmr is True
    assert cfg.enable_mmr is True
