"""REAL multi-process distributed test (VERDICT r2 next-#8).

The 8-device dryrun and mesh tests are single-process; this spawns TWO
OS processes (jax.distributed.initialize over a local coordinator, 4
virtual CPU devices each) and runs the pod-mesh hierarchical top-k
merge (parallel/multihost.py) across the process boundary — the `dcn`
axis collectives go over Gloo, exactly the multi-controller shape a
TPU pod uses over DCN.  The merged top-k must equal the single-process
exact oracle.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod_merge_matches_exact(tmp_path):
    port = _free_port()
    out = tmp_path / "pod_out.npz"
    worker = str(_REPO / "tests" / "mp_pod_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), str(port),
                          str(out)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         cwd=_REPO)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)
    assert out.exists(), logs[0]

    got = np.load(out)
    # single-process exact oracle over the SAME deterministic corpus
    full = np.random.default_rng(0).standard_normal((4096, 64)) \
        .astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    q = np.random.default_rng(1).standard_normal((4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores = q @ full.T
    exact_ids = np.argsort(-scores, axis=1)[:, :10]
    np.testing.assert_array_equal(np.sort(got["ids"], axis=1),
                                  np.sort(exact_ids, axis=1))
    # scores agree with the oracle at the returned ids
    np.testing.assert_allclose(
        np.sort(got["scores"], axis=1)[:, ::-1],
        np.sort(np.take_along_axis(scores, exact_ids, axis=1),
                axis=1)[:, ::-1],
        rtol=2e-2, atol=2e-2)
