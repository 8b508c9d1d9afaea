"""On-chip probe: is the dense scan compute-bound on f32 matmul?

Times a pure streaming Pallas matmul over a 10M x 384 bf16 corpus with
the dot executed in (a) f32 (current kernel), (b) bf16 inputs + f32
accumulation, plus (c) the reduction cost (approx_max_k vs top_k) over
the materialized [Q, N] scores.  Prints one JSON line.
"""
from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N, D, Q, BS = 10_000_000, 384, 8, 8192
NB = -(-N // BS)
NPAD = NB * BS


def k_f32(q_ref, e_ref, o_ref):
    o_ref[:] = jnp.dot(q_ref[:], e_ref[:].astype(jnp.float32).T,
                       preferred_element_type=jnp.float32)


def k_bf16(q_ref, e_ref, o_ref):
    o_ref[:] = jnp.dot(q_ref[:].astype(jnp.bfloat16), e_ref[:].T,
                       preferred_element_type=jnp.float32)


def scan(kernel, q, emb):
    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((Q, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, BS), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, NPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, emb)


from advanced_rag_tpu.utils.timing import chained_ms


def amortized(fn, rounds=10):
    """fn(i, eps) -> array; chained-dependence timing (utils/timing.py)."""
    return chained_ms(fn, rounds=rounds)


def main():
    chunk = 1_250_000

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, ck, i):
        e = jax.random.normal(ck, (chunk, D), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return lax.dynamic_update_slice(buf, e.astype(jnp.bfloat16),
                                        (i, jnp.int32(0)))

    emb = jnp.zeros((NPAD, D), jnp.bfloat16)
    for j, ck in enumerate(jax.random.split(jax.random.PRNGKey(0),
                                            NPAD // chunk)):
        emb = fill(emb, ck, jnp.int32(j * chunk))
    jax.block_until_ready(emb)

    qs = []
    for i in range(10):
        q = jax.random.normal(jax.random.PRNGKey(100 + i), (Q, D),
                              jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        qs.append(q)
    qbs = [q.astype(jnp.bfloat16) for q in qs]

    jf32 = jax.jit(lambda qq, ee: scan(k_f32, qq, ee))
    jbf16 = jax.jit(lambda qq, ee: scan(k_bf16, qq, ee))

    res = {}
    gb = NPAD * D * 2 / 1e9
    ms = amortized(lambda i, eps: jf32(qs[i % 10] + eps, emb))
    res["matmul_f32"] = {"ms": round(ms, 2), "gbs": round(gb / ms * 1e3)}
    ms = amortized(lambda i, eps: jbf16(
        qbs[i % 10] + eps.astype(jnp.bfloat16), emb))
    res["matmul_bf16"] = {"ms": round(ms, 2), "gbs": round(gb / ms * 1e3)}

    scores = jbf16(qbs[0], emb)
    jax.device_get(scores[:1, :1])
    japx = jax.jit(functools.partial(lax.approx_max_k, k=40,
                                     recall_target=0.99))
    jtop = jax.jit(functools.partial(lax.top_k, k=40))
    res["approx_max_k_ms"] = round(
        amortized(lambda i, eps: japx(scores + eps)[0]), 2)
    res["top_k_ms"] = round(
        amortized(lambda i, eps: jtop(scores + eps)[0]), 2)

    # fused: matmul + reduction in one jit (what the public API does)
    jfull = jax.jit(lambda qq, ee: lax.approx_max_k(
        scan(k_bf16, qq, ee), k=40, recall_target=0.99))
    ms = amortized(lambda i, eps: jfull(
        qbs[i % 10] + eps.astype(jnp.bfloat16), emb)[0])
    res["bf16_plus_approx"] = {"ms": round(ms, 2), "gbs": round(gb / ms * 1e3)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
