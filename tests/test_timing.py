"""Device-timing helpers (utils/timing.py) on the CPU backend.

These guard the measurement layer under docs/PERF.md: the eps chain
must stay data-dependent (fold-proof zero), both timing modes must
return sane values, and ``fetch_ms`` must synchronize on the fetched
part only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.utils.timing import (
    chained_ms,
    fetch_ms,
    scanned_ms,
    zero_scalar_of,
)


def test_zero_scalar_is_zero_but_data_dependent():
    out = {"scores": jnp.asarray([[3.5, -2.0]]), "ids": jnp.asarray([[1, 2]])}
    z = zero_scalar_of(out)
    assert float(z) == 0.0 and z.dtype == jnp.float32
    # must not constant-fold under jit: the jaxpr keeps the dependence
    jaxpr = jax.make_jaxpr(lambda x: zero_scalar_of({"s": x}))(
        jnp.ones((4,)))
    assert jaxpr.jaxpr.invars  # input is consumed, not folded away


def test_zero_scalar_int_leaf():
    z = zero_scalar_of(jnp.asarray([7, 9], jnp.int32))
    assert float(z) == 0.0


def test_chained_ms_times_a_real_call():
    x = jnp.ones((64, 64))

    @jax.jit
    def f(a):
        return a @ a

    ms = chained_ms(lambda i, eps: f(x + eps), rounds=3)
    assert ms >= 0.0 and np.isfinite(ms)


def test_scanned_ms_small_kernel():
    ops = (jnp.ones((128, 128), jnp.float32),)

    def f(eps, a):
        return (a + eps) @ a

    ms = scanned_ms(f, rounds=5, operands=ops)
    assert ms >= 0.0 and np.isfinite(ms)


def test_fetch_ms_full_and_partial():
    @jax.jit
    def f():
        return {"scores": jnp.ones((8, 8)), "ids": jnp.zeros((8,), jnp.int32)}

    assert fetch_ms(f) >= 0.0
    assert fetch_ms(f, small=lambda r: r["ids"]) >= 0.0


def test_service_main_module_imports():
    # `python -m advanced_rag_tpu.service` entry: main must be exposed
    import advanced_rag_tpu.service.__main__ as m

    assert callable(m.main)


def test_stage_timer_rolling_window():
    from advanced_rag_tpu.utils.profiling import StageTimer

    t = StageTimer(window=5)
    for _ in range(8):
        with t.stage("s"):
            pass
    rep = t.report()
    assert rep["s"]["count"] == 5
    assert rep["s"]["p50"] >= 0.0 and rep["s"]["p99"] >= rep["s"]["p50"]


def test_device_trace_and_annotate(tmp_path):
    from advanced_rag_tpu.utils.profiling import annotate, device_trace

    with device_trace(str(tmp_path)):
        with annotate("matmul"):
            x = jnp.ones((8, 8))
            (x @ x).block_until_ready()
    # a trace directory is produced
    assert any(tmp_path.rglob("*"))
