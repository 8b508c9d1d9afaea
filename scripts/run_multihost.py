#!/usr/bin/env python
"""Multi-host pod launcher: one process per TPU host, search over DCN.

Run the SAME command on every host of the pod slice (BACKLOG #9):

    JAX_COORDINATOR=<host0-ip>:8476 NPROC=<hosts> PROC_ID=<this-host> \
        python scripts/run_multihost.py

What it does on each process:
  1. ``distributed_init()`` — jax.distributed handshake over DCN.
  2. ``build_pod_mesh()`` — (dcn=hosts, shard=local chips, data=1).
  3. Builds a synthetic corpus shard-locally, places it with
     ``P(("dcn", "shard"), None)`` (each host uploads only its rows),
     and runs ``pod_dense_topk`` — per-host ICI merge first, then only
     k survivors per host cross DCN.
  4. Process 0 prints latency + the merged ids.

On a single machine this degenerates to dcn=1 and still runs — the
program is identical from laptop to pod.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import os
import time

import numpy as np


def main() -> None:
    from advanced_rag_tpu.parallel import (
        build_pod_mesh, distributed_init, pod_dense_topk,
    )

    distributed_init()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_pod_mesh()
    n_rows = int(os.environ.get("POD_ROWS", 1_000_000))
    dim = int(os.environ.get("POD_DIM", 384))
    total = mesh.shape["dcn"] * mesh.shape["shard"]
    n_rows -= n_rows % total

    # Each process materializes only its slice via make_array_from_callback
    sharding = NamedSharding(mesh, P(("dcn", "shard"), None))
    rng = np.random.default_rng(jax.process_index())

    def make_shard(index):
        shape = jax.eval_shape(lambda: jnp.zeros((n_rows, dim))).shape
        rows = range(*index[0].indices(shape[0]))
        x = rng.standard_normal((len(rows), dim)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    emb = jax.make_array_from_callback((n_rows, dim), sharding, make_shard)
    q = jnp.asarray(rng.standard_normal((8, dim)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    s, i = pod_dense_topk(emb, q, 10, None, mesh=mesh, metric="ip")
    jax.block_until_ready(i)
    t0 = time.perf_counter()
    for _ in range(10):
        s, i = pod_dense_topk(emb, q, 10, None, mesh=mesh, metric="ip")
    jax.block_until_ready(i)
    dt = (time.perf_counter() - t0) / 10 * 1e3

    if jax.process_index() == 0:
        print(f"pod mesh {dict(mesh.shape)} rows={n_rows} dim={dim}")
        print(f"pod_dense_topk amortized: {dt:.2f} ms")
        print("top ids[0]:", np.asarray(i)[0].tolist())


if __name__ == "__main__":
    main()
