"""Worker for tests/test_multiprocess_pod.py — one REAL process of a
2-process pod running the hierarchical DCN merge on CPU devices.

Invoked as: python tests/mp_pod_worker.py <proc_id> <port> <out.npz>
Each process owns 4 virtual CPU devices; the (dcn=2, shard=4) mesh
spans processes, so the `dcn` axis of pod_dense_topk really crosses a
process boundary (Gloo collectives) — the thing the in-process
8-device tests cannot exercise (VERDICT r2 next-#8).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

_repo = str(Path(__file__).resolve().parent.parent)
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main() -> None:
    proc_id, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    # the same env-driven entry the service uses (parallel/multihost.py)
    os.environ["JAX_COORDINATOR"] = f"localhost:{port}"
    os.environ["NPROC"] = "2"
    os.environ["PROC_ID"] = str(proc_id)
    # initialize BEFORE the package import (which touches the backend);
    # distributed_init() below then exercises its idempotent path
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from advanced_rag_tpu.parallel import (build_pod_mesh, distributed_init,
                                           pod_dense_topk)

    distributed_init()
    assert jax.process_count() == 2, jax.process_count()
    mesh = build_pod_mesh(dcn=2, shard=4, data=1)

    n, dim, k = 4096, 64, 10
    # deterministic corpus: every process can rebuild any global slice
    full = np.random.default_rng(0).standard_normal((n, dim)) \
        .astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    sharding = NamedSharding(mesh, P(("dcn", "shard"), None))
    emb = jax.make_array_from_callback((n, dim), sharding,
                                       lambda idx: full[idx])
    q = np.random.default_rng(1).standard_normal((4, dim)) \
        .astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    s, i = pod_dense_topk(emb, jnp.asarray(q), k, None, mesh=mesh,
                          metric="ip")
    s, i = jax.device_get((s, i))
    if proc_id == 0:
        np.savez(out_path, scores=s, ids=i)
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
