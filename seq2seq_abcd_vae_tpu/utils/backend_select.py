"""Runtime kernel-backend auto-selection (scan vs Pallas).

The Pallas LSTM/STFT kernels (ops/lstm_pallas.py, ops/stft_pallas.py) pin
weights in VMEM and win on directly attached TPUs, but a *tunneled* TPU
(e.g. this container's axon transport) pays ~0.5-1 s of dispatch latency
per pallas_call — three orders of magnitude more than the kernels save.
Which regime we are in is a property of the runtime, not the code, so it
is MEASURED once per process: time one trivial pre-compiled pallas_call;
if the dispatch exceeds SEQ2SEQ_PALLAS_DISPATCH_MS_MAX (default 20 ms),
every auto-selected backend falls back to the lax.scan path.

SEQ2SEQ_RNN_BACKEND=scan|pallas|auto (default auto) forces or defers the
choice; resolve_rnn_backend() is called once outside jit (Learner init /
bench start) and cached.
"""

from __future__ import annotations

import functools
import os
import time

_DEFAULT_MAX_MS = 20.0


@functools.lru_cache(maxsize=None)
def pallas_dispatch_ms() -> float:
    """Wall time of one pre-compiled trivial pallas_call, in ms."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    @jax.jit
    def probe(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    x = jnp.zeros((8, 128), jnp.float32)
    probe(x).block_until_ready()  # compile + first dispatch
    t0 = time.perf_counter()
    probe(x).block_until_ready()
    return (time.perf_counter() - t0) * 1e3


@functools.lru_cache(maxsize=None)
def resolve_rnn_backend() -> str:
    mode = os.environ.get("SEQ2SEQ_RNN_BACKEND", "auto")
    if mode in ("scan", "pallas"):
        return mode
    return _auto_choice()


@functools.lru_cache(maxsize=None)
def _auto_choice() -> str:
    import jax

    if jax.devices()[0].platform == "cpu":
        return "scan"  # Pallas on CPU = interpret mode (tests only)
    limit = float(os.environ.get("SEQ2SEQ_PALLAS_DISPATCH_MS_MAX",
                                 _DEFAULT_MAX_MS))
    try:
        ms = pallas_dispatch_ms()
    except Exception:
        return "scan"
    return "pallas" if ms < limit else "scan"


def backend_report() -> dict:
    """For bench/diagnostic JSON: the resolved backend and, when a
    measurement was taken, the observed dispatch latency."""
    report = {"rnn_backend": resolve_rnn_backend()}
    cached = pallas_dispatch_ms.cache_info().currsize > 0
    if cached:
        report["pallas_dispatch_ms"] = round(pallas_dispatch_ms(), 3)
    return report
