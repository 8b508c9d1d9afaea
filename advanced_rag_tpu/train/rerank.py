"""Supervised cross-encoder reranker training with hard negatives.

The reference's rerank stage is a placeholder returning dummy scores
(retrieval.py:651-681); distillation (train/distill.py) bootstraps a
real cross-encoder but can only *approximate* the bi-encoder teacher.
When (query, positive-doc) supervision exists — the service's
`/feedback` store, or any corpus whose structure pairs queries with
their documents — the cross-encoder can be trained DIRECTLY with
listwise cross-entropy over hard negatives mined from the retriever's
own top-k, the standard ms-marco reranker recipe.  Full query x doc
attention lets it out-rank both the bi-encoder and BM25.

Sharding mirrors train/contrastive.py: the (B*M) pair batch is sharded
over the mesh's data axis (DP), params over the model axis (TP) via the
same size-based partition rule — one jitted step from 1 chip to a pod.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
class RerankTrainConfig:
    steps: int = 600
    queries_per_batch: int = 16
    candidates_per_query: int = 8     # 1 positive + (M-1) hard/random negatives
    log_every: int = 100
    seed: int = 0


def make_rerank_batch(
    tok: HashingTokenizer,
    pairs: Sequence[Tuple[str, str]],
    negatives: Sequence[Sequence[str]],
    cfg: RerankTrainConfig,
    rng: np.random.Generator,
) -> Dict[str, jnp.ndarray]:
    """One listwise batch: ids/mask/segs [B*M, L] + label [B] i32.

    For each sampled query the candidate slate is its positive doc at a
    RANDOM slot plus (M-1) negatives drawn from its mined hard-negative
    list (topped up with corpus-random positives of other queries when
    the list is short).  Randomising the positive's slot keeps the
    scalar head from learning a positional shortcut.
    """
    b, m = cfg.queries_per_batch, cfg.candidates_per_query
    sel = rng.integers(0, len(pairs), b)
    labels = rng.integers(0, m, b).astype(np.int32)
    q_rep: List[str] = []
    d_rep: List[str] = []
    for row, qi in enumerate(sel):
        query, pos_doc = pairs[qi]
        pool = list(negatives[qi]) if qi < len(negatives) else []
        need = m - 1
        while len(pool) < need:
            j = int(rng.integers(0, len(pairs)))
            if j != qi:
                pool.append(pairs[j][1])
        negs = [pool[i] for i in rng.permutation(len(pool))[:need]]
        slate = negs[: labels[row]] + [pos_doc] + negs[labels[row]:]
        q_rep.extend([query] * m)
        d_rep.extend(slate)
    ids, mask, segs = tok.encode_pairs(q_rep, d_rep)
    return {
        "ids": jnp.asarray(ids),
        "mask": jnp.asarray(mask),
        "segs": jnp.asarray(segs),
        "label": jnp.asarray(labels),
    }


def make_rerank_step(
    student: CrossEncoder,
    optimizer: optax.GradientTransformation,
    tcfg: TrainConfig,
    mesh,
    params: Any,
    cfg: RerankTrainConfig,
):
    """Jitted sharded listwise-CE step.

    step_fn(params, opt_state, batch) -> (params, opt_state, metrics);
    batch = ids/mask/segs [B*M, L] + label [B].
    """
    p_spec = param_partition_spec(params, mesh, tcfg.model_axis)
    p_shard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), p_spec)
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    opt_state = optimizer.init(params)
    pair_sharding = NamedSharding(mesh, P(tcfg.data_axis, None))
    label_sharding = NamedSharding(mesh, P(tcfg.data_axis))
    b, m = cfg.queries_per_batch, cfg.candidates_per_query

    def loss_fn(p, batch):
        s = student.apply(p, batch["ids"], batch["mask"], batch["segs"])
        s = s.reshape(b, m)
        loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            s, batch["label"]))
        acc = jnp.mean((jnp.argmax(s, -1) == batch["label"])
                       .astype(jnp.float32))
        return loss, acc

    batch_shardings = {"ids": pair_sharding, "mask": pair_sharding,
                       "segs": pair_sharding, "label": label_sharding}

    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, None, batch_shardings),
        out_shardings=(p_shard, None, None),
        donate_argnums=(0, 1),
    )
    def step(p, opt, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        updates, opt = optimizer.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return p, opt, {"loss": loss, "accuracy": acc}

    eval_fn = jax.jit(loss_fn, in_shardings=(p_shard, batch_shardings))
    return step, eval_fn, params, opt_state


def train_reranker(
    pairs: Sequence[Tuple[str, str]],
    negatives: Sequence[Sequence[str]],
    *,
    encoder_config: Optional[EncoderConfig] = None,
    train_config: Optional[TrainConfig] = None,
    rerank_config: Optional[RerankTrainConfig] = None,
    mesh=None,
    tokenizer: Optional[HashingTokenizer] = None,
) -> Tuple[CrossEncoder, Any, List[Dict[str, float]]]:
    """-> (model, trained params, history).

    ``pairs``: (query, positive_doc); ``negatives[i]``: hard negatives
    for pairs[i] (mine them from the retriever's top-k minus the gold
    doc).  The returned params drop into ``CrossEncoderReranker(
    config=..., params=...)`` and serve the pipeline's top-20 -> top-5
    rerank stage (reference retrieval.py:518-553).
    """
    if not pairs:
        raise ValueError("train_reranker needs a non-empty pair list")
    cfg = encoder_config or EncoderConfig()
    tcfg = train_config or TrainConfig(learning_rate=3e-4)
    rcfg = rerank_config or RerankTrainConfig()

    student, params = init_cross_encoder(cfg, seed=rcfg.seed)
    mesh = mesh or build_train_mesh(config=tcfg)
    optimizer = make_optimizer(tcfg)
    step_fn, eval_fn, params, opt_state = make_rerank_step(
        student, optimizer, tcfg, mesh, params, rcfg)
    tok = tokenizer or HashingTokenizer(
        TokenizerConfig(vocab_size=cfg.vocab_size, max_len=cfg.max_len))
    rng = np.random.default_rng(rcfg.seed)
    ev_batch = make_rerank_batch(tok, pairs, negatives, rcfg,
                                 np.random.default_rng(rcfg.seed + 1))

    history: List[Dict[str, float]] = []
    t0 = time.perf_counter()
    for step_i in range(1, rcfg.steps + 1):
        batch = make_rerank_batch(tok, pairs, negatives, rcfg, rng)
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step_i % rcfg.log_every == 0 or step_i == rcfg.steps:
            ev_loss, ev_acc = eval_fn(params, ev_batch)
            history.append({
                "step": step_i,
                "loss": float(metrics["loss"]),
                "accuracy": float(metrics["accuracy"]),
                "eval_loss": float(ev_loss),
                "eval_accuracy": float(ev_acc),
                "elapsed_s": time.perf_counter() - t0,
            })
    return student, params, history


def save_reranker(params: Any, config: EncoderConfig, path) -> None:
    """Persist trained reranker params WITH their encoder geometry so
    the service can restore without out-of-band config
    (RAG_RERANKER=ckpt:<path> — service/app.py)."""
    from dataclasses import asdict

    from .loop import save_params

    meta = {k: v for k, v in asdict(config).items() if k != "dtype"}
    save_params({"encoder_config": meta, "params": params}, path)


def load_reranker(path):
    """-> (EncoderConfig, params) from a save_reranker checkpoint."""
    from .loop import load_params

    blob = load_params(path)
    meta = blob["encoder_config"]
    cfg = EncoderConfig(
        vocab_size=int(meta["vocab_size"]),
        hidden_dim=int(meta["hidden_dim"]),
        num_layers=int(meta["num_layers"]),
        num_heads=int(meta["num_heads"]),
        mlp_dim=int(meta["mlp_dim"]),
        max_len=int(meta["max_len"]),
        num_segments=int(meta["num_segments"]),
        dropout=float(meta["dropout"]),
    )
    return cfg, blob["params"]


__all__ = [
    "RerankTrainConfig",
    "load_reranker",
    "make_rerank_batch",
    "make_rerank_step",
    "save_reranker",
    "train_reranker",
]
