"""Contrastive trainer: loss decreases, shardings hold, 1-device parity."""

import jax
import jax.numpy as jnp
import numpy as np

from advanced_rag_tpu.models.encoder import EncoderConfig, init_bi_encoder
from advanced_rag_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig
from advanced_rag_tpu.train import (

    TrainConfig,
    build_train_mesh,
    make_optimizer,
    make_train_step,
    param_partition_spec,
    synthetic_pair_batch,
)

# heavy compiles / large corpora: nightly + pre-merge (pytest -m slow)
pytestmark = __import__("pytest").mark.slow

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=2, num_heads=4,
                     mlp_dim=64, max_len=16)


def _setup(mesh, steps_cfg=None):
    model, params = init_bi_encoder(TINY, out_dim=16, seed=0)
    cfg = steps_cfg or TrainConfig(learning_rate=1e-3, warmup_steps=2,
                                   total_steps=50, temperature=0.1)
    opt = make_optimizer(cfg)
    step, params, opt_state = make_train_step(model, opt, cfg, mesh, params)
    tok = HashingTokenizer(TokenizerConfig(vocab_size=512, max_len=16))
    return step, params, opt_state, tok, cfg


def test_loss_decreases_on_mesh():
    mesh = build_train_mesh(8)  # (4, 2): dp=4, tp=2
    step, params, opt_state, tok, _ = _setup(mesh)
    texts = [f"document about topic {i} with words alpha beta gamma {i}"
             for i in range(64)]
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(8):
        batch = synthetic_pair_batch(tok, texts, 16, rng, max_len=16)
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_param_partition_rule():
    mesh = build_train_mesh(8)
    _, params = init_bi_encoder(TINY, out_dim=16, seed=0)
    specs = param_partition_spec(params, mesh, "model")
    flat = jax.tree_util.tree_leaves_with_path(specs)
    # At least the embedding table and MLP kernels must be TP-sharded.
    sharded = [p for p, s in flat if s != jax.sharding.PartitionSpec()]
    assert len(sharded) >= 4
    # Biases (1-D) stay replicated.
    for path, spec in flat:
        name = jax.tree_util.keystr(path)
        if "bias" in name:
            assert spec == jax.sharding.PartitionSpec()


def test_single_device_mesh_runs():
    mesh = build_train_mesh(1)
    step, params, opt_state, tok, _ = _setup(mesh)
    rng = np.random.default_rng(1)
    batch = synthetic_pair_batch(tok, ["hello world doc"] * 8, 8, rng, max_len=16)
    params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_loop_improves_eval(tmp_path):
    from advanced_rag_tpu.train import TrainLoopConfig, load_params, train_biencoder

    texts = [f"document {i} concerns subject {i % 13} with detail token "
             f"tok{i} tok{i+1} tok{i+2} extra words here" for i in range(64)]
    model, params, history = train_biencoder(
        texts,
        encoder_config=TINY,
        out_dim=16,
        train_config=TrainConfig(learning_rate=2e-3, warmup_steps=5,
                                 total_steps=60, temperature=0.1),
        loop_config=TrainLoopConfig(steps=60, batch_size=16, eval_every=30,
                                    eval_pairs=16, log_every=30,
                                    checkpoint_dir=str(tmp_path)),
    )
    assert history[-1]["loss"] < history[0]["loss"]
    # random = 1/16 = 0.0625; 60 tiny-model steps reach ~0.4
    assert history[-1]["eval_recall_at_1"] >= 0.25
    # checkpoint round-trip
    restored = load_params(tmp_path / "step_60")
    import jax
    import numpy as np

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_distill_cross_encoder_matches_teacher():
    """KL to the bi-encoder teacher drops and argmax agreement rises —
    the label-free reranker bootstrap (train/distill.py)."""
    from advanced_rag_tpu.train import (
        DistillConfig, distill_cross_encoder, train_biencoder, TrainLoopConfig,
    )

    texts = [f"domain {i % 4} text about subject {i} alpha beta {i * 7}"
             for i in range(48)]
    # quick teacher: a few contrastive steps on the tiny geometry
    teacher_model, teacher_params, _ = train_biencoder(
        texts, encoder_config=TINY, out_dim=16,
        train_config=TrainConfig(learning_rate=1e-3, warmup_steps=2,
                                 total_steps=20, temperature=0.1),
        loop_config=TrainLoopConfig(steps=10, batch_size=16, log_every=10,
                                    eval_every=100),
        mesh=build_train_mesh(8),
    )
    student, params, history = distill_cross_encoder(
        texts, teacher_model, teacher_params,
        encoder_config=TINY,
        train_config=TrainConfig(learning_rate=3e-3, warmup_steps=2,
                                 total_steps=60),
        distill_config=DistillConfig(steps=40, queries_per_batch=8,
                                     candidates_per_query=4, log_every=10),
        mesh=build_train_mesh(8),
    )
    # held-out KL to the teacher must drop (the distill objective);
    # per-training-batch numbers are noisy at this batch size.
    assert history[-1]["eval_loss"] < history[0]["eval_loss"]
    assert history[-1]["eval_agreement"] >= history[0]["eval_agreement"]
    assert np.isfinite([h["loss"] for h in history]).all()

    # the distilled params drop into the serving reranker
    from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker

    rr = CrossEncoderReranker(config=TINY, params=params)
    scores = rr.score("subject 3 alpha", [texts[3], texts[11], texts[20]])
    assert scores.shape == (3,) and np.isfinite(scores).all()


def test_train_reranker_supervised():
    """Listwise-CE reranker training on mined negatives: eval accuracy
    rises well above the 1/M random-slot floor and the trained params
    rank the true document first (train/rerank.py)."""
    from advanced_rag_tpu.train import (
        RerankTrainConfig, TrainConfig, build_train_mesh, train_reranker,
    )

    rng = np.random.default_rng(3)
    topics = ["alpha kernels", "beta retrieval", "gamma sharding",
              "delta caching"]
    pairs, negatives = [], []
    for i in range(48):
        t = topics[i % 4]
        pairs.append((f"question about {t} item {i}",
                      f"document on {t} item {i} body text"))
    for i in range(48):
        negatives.append([pairs[j][1] for j in rng.integers(0, 48, 6)
                          if j != i])

    model, params, history = train_reranker(
        pairs, negatives,
        encoder_config=TINY,
        train_config=TrainConfig(learning_rate=3e-3, warmup_steps=2,
                                 total_steps=120),
        rerank_config=RerankTrainConfig(steps=120, queries_per_batch=8,
                                        candidates_per_query=4,
                                        log_every=30, q_len=6, d_len=9),
        mesh=build_train_mesh(8),
    )
    assert history[-1]["eval_loss"] < history[0]["eval_loss"]
    assert history[-1]["eval_accuracy"] > 0.5          # floor is 1/M = 0.25
    assert np.isfinite([h["loss"] for h in history]).all()

    from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker

    rr = CrossEncoderReranker(config=TINY, params=params, q_len=6, d_len=9)
    q, gold = pairs[5]
    cands = [pairs[9][1], gold, pairs[17][1], pairs[33][1]]
    scores = rr.score(q, cands)
    assert int(np.argmax(scores)) == 1


def test_token_jaccard_and_false_negative_filter():
    """Near-duplicates of the positive are dropped from mined negative
    lists (28% of real corpora have Jaccard>0.8 twins — the round-2
    reranker's contradictory-label failure)."""
    from advanced_rag_tpu.train import filter_false_negatives, token_jaccard

    pos = "compute the singular value decomposition of a matrix"
    twin = "compute the singular value decomposition of a matrix."
    other = "open a file descriptor and buffer reads"
    assert token_jaccard(pos, twin) > 0.9
    assert token_jaccard(pos, other) < 0.2
    kept = filter_false_negatives(pos, [twin, other, pos])
    assert kept == [other]
    assert token_jaccard("", "x") == 0.0


def test_warm_start_copies_trunk_without_aliasing():
    """Warm-start transfers the bi-encoder trunk but must NOT alias its
    buffers: the rerank step donates params, and an aliased leaf gets
    the donor's buffer deleted (observed as 'Array has been deleted'
    on the next uncached encode)."""
    import jax.numpy as jnp

    from advanced_rag_tpu.models.encoder import (init_bi_encoder,
                                                 init_cross_encoder)
    from advanced_rag_tpu.train import warm_start_cross_encoder

    bi, bi_p = init_bi_encoder(TINY, out_dim=16, seed=0)
    ce, ce_p = init_cross_encoder(TINY, seed=1)
    merged = warm_start_cross_encoder(ce_p, bi_p)
    src = bi_p["params"]["trunk"]["tok_embed"]["embedding"]
    dst = merged["params"]["trunk"]["tok_embed"]["embedding"]
    assert np.allclose(np.asarray(src), np.asarray(dst))
    assert dst is not src                      # copied, not aliased
    # CE-only leaves keep their fresh init
    assert "seg_embed" in merged["params"]["trunk"]
    assert "score" in merged["params"]


def test_warm_start_pos_embed_prefix_for_longer_ce():
    """A CE with a longer position table than the bi-encoder gets the
    trained prefix + fresh tail."""
    from dataclasses import replace

    from advanced_rag_tpu.models.encoder import (EncoderConfig,
                                                 init_bi_encoder,
                                                 init_cross_encoder)
    from advanced_rag_tpu.train import warm_start_cross_encoder

    long_cfg = replace(TINY, max_len=24)
    _, bi_p = init_bi_encoder(TINY, out_dim=16, seed=0)       # max_len 16
    _, ce_p = init_cross_encoder(long_cfg, seed=1)            # max_len 24
    merged = warm_start_cross_encoder(ce_p, bi_p)
    pos = np.asarray(merged["params"]["trunk"]["pos_embed"])
    assert pos.shape[0] == 24
    np.testing.assert_allclose(
        pos[:16], np.asarray(bi_p["params"]["trunk"]["pos_embed"]))


def test_make_rerank_batch_guards():
    """Degenerate pair lists raise instead of spinning; negatives equal
    to the positive are never used (ADVICE r2)."""
    import pytest

    from advanced_rag_tpu.models.tokenizer import (HashingTokenizer,
                                                   TokenizerConfig)
    from advanced_rag_tpu.train import RerankTrainConfig
    from advanced_rag_tpu.train.rerank import make_rerank_batch

    tok = HashingTokenizer(TokenizerConfig(vocab_size=256, max_len=16))
    cfg = RerankTrainConfig(queries_per_batch=2, candidates_per_query=3,
                            q_len=5, d_len=10)
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        make_rerank_batch(tok, [("q", "d")], [[]], cfg, rng)
    # every other doc equals the positive -> cannot build a slate
    same = [("q1", "dup"), ("q2", "dup"), ("q3", "dup")]
    with pytest.raises(ValueError):
        make_rerank_batch(tok, same, [[], [], []], cfg, rng)
    # normal case: positive-equal negatives in the mined list are skipped
    pairs = [("q1", "d1"), ("q2", "d2"), ("q3", "d3")]
    negs = [["d1", "d2", "d3"], ["d2", "d1"], ["d3", "d1", "d2"]]
    batch = make_rerank_batch(tok, pairs, negs, cfg, rng)
    assert batch["ids"].shape == (6, 16)       # q_len + d_len + 1
    assert batch["label"].shape == (2,)
