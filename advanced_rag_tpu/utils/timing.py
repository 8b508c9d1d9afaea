"""Device-timing helpers that stay honest on relay/tunnel backends.

On the tunneled TPU backend used in this environment (platform "axon"),
``jax.block_until_ready`` can resolve BEFORE the device has actually
executed the dispatched program (the ready-event is acknowledged by the
tunnel, not the chip) — measured: a 10M x 384 matmul "completes" in
0.18 ms under ``block_until_ready`` but takes ~25-35 ms when a literal
is fetched.  Only a device->host copy of output bytes is a reliable
synchronization point.

These helpers therefore time work in one of two sound ways:

- ``fetch_ms``: single-call blocking latency — the timed region ends
  with a ``jax.device_get`` of (a small part of) the output, exactly
  what a serving host does with results.
- ``chained_ms``: amortized per-call device time — each call folds in a
  zero-valued f32 scalar derived from the previous call's output, so
  the calls form a data-dependent chain, and ONE final fetch forces the
  entire chain.  Per-call overhead is one tiny elementwise op; the
  single tunnel round-trip is amortized across ``rounds``.

Replaces: nothing in the reference (it has no device timing); this is
the measurement layer under docs/PERF.md and the bench scripts.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["zero_scalar_of", "chained_ms", "fetch_ms"]


def zero_scalar_of(out: Any) -> jnp.ndarray:
    """A f32 scalar that is always 0.0 but data-depends on ``out``.

    Uses the first leaf of the pytree; cheap (one element) regardless of
    output size.
    """
    leaves = jax.tree_util.tree_leaves(out)
    x = jnp.ravel(leaves[0])[:1]
    return x.astype(jnp.float32).sum() * 0.0


def chained_ms(
    make_call: Callable[[int, jnp.ndarray], Any],
    rounds: int = 10,
) -> float:
    """Amortized per-call wall ms of ``make_call(i, eps)``.

    ``make_call`` MUST fold ``eps`` (a zero f32 scalar carrying a data
    dependence on the previous call) into its inputs — e.g.
    ``lambda i, eps: f(q[i] + eps)`` — so no layer of the stack can
    elide, reorder, or early-ack the repeated dispatches.  The first
    call (compile + execute) is excluded; one literal fetch at the end
    forces the whole chain.
    """
    eps = jnp.float32(0.0)
    out = make_call(0, eps)
    eps = zero_scalar_of(out)
    float(eps)  # compile + first execution, excluded from timing
    t0 = time.perf_counter()
    for i in range(rounds):
        out = make_call(i, eps)
        eps = zero_scalar_of(out)
    assert float(eps) == 0.0  # the one synchronizing fetch
    return (time.perf_counter() - t0) / rounds * 1e3


def fetch_ms(call: Callable[[], Any], small: Callable[[Any], Any] = None) -> float:
    """Blocking single-call wall ms, synchronized by fetching output.

    ``small`` selects what to copy back (default: the whole output) —
    pass e.g. ``lambda r: r.ids`` to fetch only the part a server would.
    """
    t0 = time.perf_counter()
    out = call()
    jax.device_get(small(out) if small is not None else out)
    return (time.perf_counter() - t0) * 1e3
