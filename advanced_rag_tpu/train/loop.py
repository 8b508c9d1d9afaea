"""Training loop: contrastive bi-encoder fine-tuning with eval + checkpoints.

Drives train/contrastive.py's sharded step: inverse-cloze synthetic
pairs (or user-supplied pairs) -> InfoNCE over the (data, model) mesh,
periodic retrieval-accuracy eval on held-out pairs, orbax parameter
checkpoints.  The trained params drop into ``NeuralEmbedder(params=...)``
and the corpus can be re-embedded in place (drift remediation —
evaluation.py recommendations say "re-embed with the current model").
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import EncoderConfig, init_bi_encoder
from ..models.tokenizer import HashingTokenizer, TokenizerConfig
from .contrastive import (
    TrainConfig,
    build_train_mesh,
    make_optimizer,
    make_train_step,
    synthetic_pair_batch,
)


@dataclass
class TrainLoopConfig:
    steps: int = 500
    batch_size: int = 64
    eval_every: int = 100
    eval_pairs: int = 64
    log_every: int = 50
    checkpoint_dir: Optional[str] = None
    seed: int = 0


def _eval_recall_at_1(model, params, tok, pairs: List[Tuple[str, str]],
                      max_len: int) -> float:
    """Query->its-own-doc retrieval accuracy over the eval pool."""
    q_ids, q_mask = tok.encode_batch([q for q, _ in pairs], max_len)
    d_ids, d_mask = tok.encode_batch([d for _, d in pairs], max_len)
    q = model.apply(params, jnp.asarray(q_ids), jnp.asarray(q_mask))
    d = model.apply(params, jnp.asarray(d_ids), jnp.asarray(d_mask))
    sim = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
    pred = np.asarray(jnp.argmax(sim, axis=1))
    return float((pred == np.arange(len(pairs))).mean())


def save_params(params: Any, path: str | Path) -> None:
    """Orbax pytree checkpoint (SURVEY.md §5 checkpoint/resume)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(Path(path).absolute(), params, force=True)


def load_params(path: str | Path) -> Any:
    """Restore an orbax pytree and CANONICALIZE its array leaves.

    Orbax restores leaves with the NamedSharding of the mesh they were
    saved under (a 1x1 data/model mesh here).  Feeding such arrays to a
    program jitted without shardings is numerically fine but poisons
    CHAINED dispatch on this backend: measured 780 ms/round chained vs
    14 ms with the same values rematerialized as plain single-device
    arrays (blocking latency is unaffected, ~36 ms either way — the
    round-trip hides the resharding stall).  Serving paths dispatch
    pipelined, so every restored leaf is round-tripped through host
    memory into a canonical SingleDeviceSharding array."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    p = Path(path).absolute()
    # Restore to HOST numpy, then upload: the naive restore-to-device +
    # per-leaf np.asarray pays one device->host tunnel round trip PER
    # LEAF — measured 150 s for a 66 MB checkpoint on the tunneled dev
    # chip vs ~4 s this way (uploads pipeline; downloads serialize).
    try:
        meta = ckptr.metadata(p).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        blob = ckptr.restore(p, restore_args=restore_args)
    except Exception:
        # fallback: device restore + per-leaf host round trip (slow
        # but always correct)
        blob = ckptr.restore(p)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x))
        if isinstance(x, (jax.Array, np.ndarray)) else x, blob)


def save_biencoder(params: Any, config: EncoderConfig, out_dim: int,
                   path: str | Path) -> None:
    """Persist trained bi-encoder params WITH their encoder geometry and
    projection dim, so downstream benches/services restore the exact
    serving model without out-of-band config (mirrors save_reranker;
    consumed by scripts/bench_quality_100k.py and RAG_EMBEDDER=ckpt:)."""
    from dataclasses import asdict

    meta = {k: v for k, v in asdict(config).items() if k != "dtype"}
    meta["out_dim"] = int(out_dim)
    save_params({"encoder_config": meta, "params": params}, path)


def load_biencoder(path: str | Path):
    """-> (EncoderConfig, out_dim, params) from a save_biencoder ckpt."""
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
        lexical_match=bool(meta.get("lexical_match", False)),
        num_reserved_ids=int(meta.get("num_reserved_ids", 8)),
        lexical_pool=bool(meta.get("lexical_pool", False)),
    )
    return cfg, int(meta["out_dim"]), blob["params"]


def train_biencoder(
    texts: Sequence[str],
    *,
    encoder_config: Optional[EncoderConfig] = None,
    out_dim: int = 384,
    train_config: Optional[TrainConfig] = None,
    loop_config: Optional[TrainLoopConfig] = None,
    mesh=None,
    pair_fn: Optional[Callable[[np.random.Generator], Dict[str, jnp.ndarray]]] = None,
) -> Tuple[Any, Any, List[Dict[str, float]]]:
    """-> (model, trained_params, history of {step, loss, accuracy, ...})."""
    cfg = encoder_config or EncoderConfig()
    tcfg = train_config or TrainConfig()
    lcfg = loop_config or TrainLoopConfig()
    if not texts:
        raise ValueError("train_biencoder needs a non-empty corpus")

    model, params = init_bi_encoder(cfg, out_dim=out_dim, seed=lcfg.seed)
    mesh = mesh or build_train_mesh(config=tcfg)
    optimizer = make_optimizer(tcfg)
    step_fn, params, opt_state = make_train_step(
        model, optimizer, tcfg, mesh, params)
    tok = HashingTokenizer(TokenizerConfig(vocab_size=cfg.vocab_size,
                                           max_len=cfg.max_len))
    rng = np.random.default_rng(lcfg.seed)

    # held-out eval pool: inverse-cloze pairs from the tail of the corpus
    eval_rng = np.random.default_rng(lcfg.seed + 1)
    eval_pairs: List[Tuple[str, str]] = []
    pool = list(texts)[-max(lcfg.eval_pairs, 8):]
    for doc in pool[: lcfg.eval_pairs]:
        words = doc.split()
        if len(words) <= 4:
            eval_pairs.append((doc, doc))
        else:
            w = eval_rng.integers(2, min(8, len(words)))
            s = eval_rng.integers(0, len(words) - w + 1)
            eval_pairs.append((" ".join(words[s : s + w]), doc))

    history: List[Dict[str, float]] = []
    t0 = time.perf_counter()
    for step_i in range(1, lcfg.steps + 1):
        batch = (pair_fn(rng) if pair_fn is not None else
                 synthetic_pair_batch(tok, list(texts), lcfg.batch_size, rng,
                                      max_len=cfg.max_len))
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step_i % lcfg.log_every == 0 or step_i == lcfg.steps:
            entry = {
                "step": step_i,
                "loss": float(metrics["loss"]),
                "accuracy": float(metrics["accuracy"]),
                "grad_norm": float(metrics["grad_norm"]),
                "elapsed_s": time.perf_counter() - t0,
            }
            if step_i % lcfg.eval_every == 0 or step_i == lcfg.steps:
                entry["eval_recall_at_1"] = _eval_recall_at_1(
                    model, params, tok, eval_pairs, cfg.max_len)
            history.append(entry)
        if lcfg.checkpoint_dir and step_i % lcfg.eval_every == 0:
            save_params(params, Path(lcfg.checkpoint_dir) / f"step_{step_i}")
    return model, params, history


__all__ = ["TrainLoopConfig", "train_biencoder", "save_params",
           "load_params", "save_biencoder", "load_biencoder"]
