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

__all__ = ["zero_scalar_of", "chained_ms", "fetch_ms", "scanned_ms"]


def zero_scalar_of(out: Any) -> jnp.ndarray:
    """A f32 scalar that is always 0.0 but data-depends on ``out``.

    Uses the first leaf of the pytree; cheap (one element) regardless of
    output size.  The zero is built as ``min(|v|, 0)`` — not ``v * 0``,
    which XLA constant-folds to 0.0 under jit, severing the data chain
    and letting the whole timed body dead-code-eliminate (observed: a
    scan of 50 kernel calls "ran" in 0 ms).  ``min(|v|, 0)`` is always
    0.0 for non-NaN v but cannot be folded without knowing v.
    """
    leaves = jax.tree_util.tree_leaves(out)
    x = jnp.ravel(leaves[0])[:1]
    v = x.astype(jnp.float32).sum()
    return jnp.minimum(jnp.abs(v), 0.0)


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


def scanned_ms(
    fn: Callable[..., Any],
    rounds: int = 20,
    operands: tuple = (),
) -> float:
    """True per-call DEVICE ms of ``fn(eps)``: the whole round chain runs
    inside ONE jitted program.

    ``chained_ms`` dispatches each round from the host; on the tunneled
    backend every dispatch costs ~1.5 ms and each round issues several
    (the kernel + the eps ops), a ~4.5 ms/call additive floor — measured:
    a trivial jitted elementwise op "takes" 4.5 ms under ``chained_ms``.
    Here a ``lax.scan`` of length ``rounds`` folds the data-dependent eps
    chain on device (XLA cannot elide iterations: each call's input
    depends on the previous output), so per-call host cost is zero.  Two
    lengths (rounds and 1) are timed and differenced, cancelling the
    final-fetch round trip and any fixed program overhead.

    Use for kernel/stage microbenchmarks; serving latency (which really
    does pay the dispatch + fetch path) belongs to ``fetch_ms``.

    Large arrays MUST be passed via ``operands`` (``fn(eps, *operands)``)
    — not closed over: jit closures become HLO constants, and on a
    remote-compile backend the whole corpus would ship inside the
    compile request (observed: HTTP 413 at 1M rows).
    """
    from jax import lax

    def make(length: int):
        @jax.jit
        def run(eps0, *ops):
            def body(eps, _):
                return zero_scalar_of(fn(eps, *ops)), None
            eps, _ = lax.scan(body, eps0, None, length=length)
            return eps
        return run

    run_n, run_1 = make(rounds), make(1)
    zero = jnp.float32(0.0)
    float(run_n(zero, *operands)), float(run_1(zero, *operands))

    def best(run) -> float:
        # min over repeats: the fetch round-trip carries several ms of
        # tunnel jitter, which the length-difference would otherwise
        # turn into noise comparable to a sub-ms kernel
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            assert float(run(zero, *operands)) == 0.0
            times.append(time.perf_counter() - t0)
        return min(times)

    return max(best(run_n) - best(run_1), 0.0) / (rounds - 1) * 1e3


def fetch_ms(call: Callable[[], Any], small: Callable[[Any], Any] = None) -> float:
    """Blocking single-call wall ms, synchronized by fetching output.

    ``small`` selects what to copy back (default: the whole output) —
    pass e.g. ``lambda r: r.ids`` to fetch only the part a server would.
    """
    t0 = time.perf_counter()
    out = call()
    jax.device_get(small(out) if small is not None else out)
    return (time.perf_counter() - t0) * 1e3
