"""Cross-encoder distillation from the bi-encoder (BACKLOG #10).

The reference's reranker is a placeholder returning dummy scores
(retrieval.py:651-681).  Here the real cross-encoder is *bootstrapped
with zero labels* by distilling the trained bi-encoder retriever
(train/loop.py): for each synthetic query, the teacher scores the
positive document plus sampled negatives, and the student cross-encoder
matches the teacher's score distribution (listwise softmax KL — the
standard reranker-distillation objective).  Feedback signals collected
by the service (`/feedback` -> LearnedRanker) can fine-tune from there.

Sharding mirrors train/contrastive.py: the (B*M) pair batch is sharded
over the mesh's data axis (DP), student params over the model axis (TP)
via the same size-based partition rule — one jitted step from 1 chip to
a pod.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.encoder import CrossEncoder, EncoderConfig, init_cross_encoder
from ..models.tokenizer import HashingTokenizer, TokenizerConfig
from .contrastive import (
    TrainConfig,
    build_train_mesh,
    make_optimizer,
    param_partition_spec,
)


@dataclass
class DistillConfig:
    steps: int = 300
    queries_per_batch: int = 16
    candidates_per_query: int = 8     # 1 positive + (M-1) random negatives
    teacher_temperature: float = 0.05  # matches InfoNCE training temp
    student_temperature: float = 1.0
    log_every: int = 50
    seed: int = 0


def _cloze_query(doc: str, rng: np.random.Generator) -> str:
    words = doc.split()
    if len(words) <= 4:
        return doc
    w = rng.integers(2, min(8, len(words)))
    s = rng.integers(0, len(words) - w + 1)
    return " ".join(words[s : s + w])


def make_distill_batch(
    tok: HashingTokenizer,
    texts: Sequence[str],
    cfg: DistillConfig,
    rng: np.random.Generator,
    max_len: int,
) -> Tuple[Dict[str, jnp.ndarray], List[str], List[List[str]]]:
    """-> (student pair batch [B*M, L], queries [B], candidate docs
    [B][M]).  Candidate 0 is the positive; the rest corpus negatives.
    The same (queries, docs) go to the teacher so both sides score
    identical pairs."""
    b, m = cfg.queries_per_batch, cfg.candidates_per_query
    pos = rng.integers(0, len(texts), b)
    queries = [_cloze_query(texts[i], rng) for i in pos]
    cand = np.empty((b, m), np.int64)
    cand[:, 0] = pos
    cand[:, 1:] = rng.integers(0, len(texts), (b, m - 1))
    docs = [[texts[i] for i in row] for row in cand]
    q_rep = [q for q in queries for _ in range(m)]
    d_rep = [d for row in docs for d in row]
    ids, mask, segs = tok.encode_pairs(q_rep, d_rep)
    return (
        {"ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
         "segs": jnp.asarray(segs)},
        queries,
        docs,
    )


def make_teacher_fn(
    teacher_model: Any, teacher_params: Any, tok: HashingTokenizer,
    max_len: int, temperature: float,
) -> Callable[[Sequence[str], Sequence[Sequence[str]]], np.ndarray]:
    """Teacher scoring: bi-encoder cosine / temperature -> [B, M] f32."""

    @jax.jit
    def _embed(p, ids, mask):
        return teacher_model.apply(p, ids, mask)

    def score(queries: Sequence[str], docs: Sequence[Sequence[str]]) -> np.ndarray:
        q_ids, q_mask = tok.encode_batch(list(queries), max_len)
        flat = [d for row in docs for d in row]
        d_ids, d_mask = tok.encode_batch(flat, max_len)
        q = _embed(teacher_params, jnp.asarray(q_ids), jnp.asarray(q_mask))
        d = _embed(teacher_params, jnp.asarray(d_ids), jnp.asarray(d_mask))
        m = len(docs[0])
        d = d.reshape(len(queries), m, -1)
        s = jnp.einsum("bd,bmd->bm", q, d) / temperature
        return np.asarray(s, np.float32)

    return score


def make_distill_step(
    student: CrossEncoder,
    optimizer: optax.GradientTransformation,
    tcfg: TrainConfig,
    mesh,
    params: Any,
    cfg: DistillConfig,
):
    """Jitted sharded distillation step.

    step_fn(params, opt_state, batch) -> (params, opt_state, metrics);
    batch = ids/mask/segs [B*M, L] + teacher [B, M].
    """
    p_spec = param_partition_spec(params, mesh, tcfg.model_axis)
    p_shard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), p_spec)
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    opt_state = optimizer.init(params)
    pair_sharding = NamedSharding(mesh, P(tcfg.data_axis, None))
    t_sharding = NamedSharding(mesh, P(tcfg.data_axis, None))
    b, m = cfg.queries_per_batch, cfg.candidates_per_query

    def loss_fn(p, batch):
        s = student.apply(p, batch["ids"], batch["mask"], batch["segs"])
        s = s.reshape(b, m) / cfg.student_temperature
        t = batch["teacher"]                            # already /teacher_temp
        log_p = jax.nn.log_softmax(s, axis=-1)
        q = jax.nn.softmax(t, axis=-1)
        kl = jnp.mean(jnp.sum(q * (jax.nn.log_softmax(t, -1) - log_p), -1))
        agree = jnp.mean((jnp.argmax(s, -1) == jnp.argmax(t, -1))
                         .astype(jnp.float32))
        return kl, agree

    batch_shardings = {"ids": pair_sharding, "mask": pair_sharding,
                       "segs": pair_sharding, "teacher": t_sharding}

    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, None, batch_shardings),
        out_shardings=(p_shard, None, None),
        donate_argnums=(0, 1),
    )
    def step(p, opt, batch):
        (loss, agree), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        updates, opt = optimizer.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return p, opt, {"loss": loss, "teacher_agreement": agree}

    eval_fn = jax.jit(loss_fn, in_shardings=(p_shard, batch_shardings))

    return step, eval_fn, params, opt_state


def distill_cross_encoder(
    texts: Sequence[str],
    teacher_model: Any,
    teacher_params: Any,
    *,
    encoder_config: Optional[EncoderConfig] = None,
    train_config: Optional[TrainConfig] = None,
    distill_config: Optional[DistillConfig] = None,
    mesh=None,
) -> Tuple[CrossEncoder, Any, List[Dict[str, float]]]:
    """-> (student model, trained params, history).  The returned params
    drop into ``CrossEncoderReranker(config=..., params=...)`` and serve
    the pipeline's top-20 -> top-5 rerank stage."""
    if not texts:
        raise ValueError("distill_cross_encoder needs a non-empty corpus")
    cfg = encoder_config or EncoderConfig()
    tcfg = train_config or TrainConfig(learning_rate=1e-4)
    dcfg = distill_config or DistillConfig()

    student, params = init_cross_encoder(cfg, seed=dcfg.seed)
    mesh = mesh or build_train_mesh(config=tcfg)
    optimizer = make_optimizer(tcfg)
    step_fn, eval_fn, params, opt_state = make_distill_step(
        student, optimizer, tcfg, mesh, params, dcfg)
    tok = HashingTokenizer(TokenizerConfig(vocab_size=cfg.vocab_size,
                                           max_len=cfg.max_len))
    teacher = make_teacher_fn(teacher_model, teacher_params, tok,
                              cfg.max_len, dcfg.teacher_temperature)
    rng = np.random.default_rng(dcfg.seed)

    # fixed held-out eval batch: per-training-batch KL is noisy (each
    # batch has its own teacher-entropy floor); progress is measured on
    # one stable sample
    ev_batch, ev_q, ev_docs = make_distill_batch(
        tok, texts, dcfg, np.random.default_rng(dcfg.seed + 1), cfg.max_len)
    ev_batch["teacher"] = jnp.asarray(teacher(ev_q, ev_docs))

    history: List[Dict[str, float]] = []
    t0 = time.perf_counter()
    for step_i in range(1, dcfg.steps + 1):
        batch, queries, docs = make_distill_batch(tok, texts, dcfg, rng,
                                                  cfg.max_len)
        batch["teacher"] = jnp.asarray(teacher(queries, docs))
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step_i % dcfg.log_every == 0 or step_i == dcfg.steps:
            ev_loss, ev_agree = eval_fn(params, ev_batch)
            history.append({
                "step": step_i,
                "loss": float(metrics["loss"]),
                "teacher_agreement": float(metrics["teacher_agreement"]),
                "eval_loss": float(ev_loss),
                "eval_agreement": float(ev_agree),
                "elapsed_s": time.perf_counter() - t0,
            })
    return student, params, history


__all__ = [
    "DistillConfig",
    "make_distill_batch",
    "make_teacher_fn",
    "make_distill_step",
    "distill_cross_encoder",
]
