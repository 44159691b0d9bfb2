"""Runtime kernel-backend auto-selection (scan vs Pallas), drift-proof.

The Pallas LSTM/decoder/STFT kernels (ops/*_pallas.py) pin weights in
VMEM and win on directly attached TPUs, but a *tunneled* TPU (this
container's axon transport) pays a per-``pallas_call`` dispatch penalty
that is a property of the runtime, not the code — and it DRIFTS: round 1
measured ~0.5-1 s/call, round 2 measured 0.07-3 ms *within one session*
(BASELINE.md).  So the choice is measured, re-measured, and hysteresis-
guarded rather than assumed or cached forever:

- at first use, one probe (median of up to 3 timed dispatches of a
  pre-compiled trivial kernel) picks ``pallas`` iff the dispatch is under
  ``SEQ2SEQ_PALLAS_DISPATCH_MS_MAX`` (default 20 ms);
- the Learner re-probes at every epoch boundary via ``maybe_reprobe``;
  a switch AWAY from pallas requires the dispatch to exceed 2x the
  limit, a switch BACK requires it to fall under 0.5x — measurements
  inside the [0.5x, 2x] band never flap the backend;
- every probe is appended to a decision trail exposed by
  ``backend_report()`` and logged by the Learner to history.log.

A backend switch takes effect because the resolved name rides in the
jitted step's static ``StepStatics.rnn_backend`` field: a new value is a
new jit cache key, and the retrace re-reads the selector.

``SEQ2SEQ_RNN_BACKEND=scan|pallas|auto`` (default auto) forces or defers
the choice; forced modes never probe and never switch.
"""

from __future__ import annotations

import os
import statistics
import time

_DEFAULT_MAX_MS = 20.0
# hysteresis band: leave pallas above limit*_UP, re-enter below
# limit*_DOWN; anything between keeps the current choice
_UP_FACTOR = 2.0
_DOWN_FACTOR = 0.5


def _default_platform() -> str:
    import jax

    return jax.devices()[0].platform


def _default_measure() -> float:
    """MARGINAL per-dispatch cost of a pallas_call vs a plain XLA
    dispatch, in ms (median of 3 pipelined measurements).

    Two measurement rules this tunnel forces (utils/sync.py):
    - jax.block_until_ready may be a no-op, so every timed chunk is
      closed by a host fetch (which cannot complete early);
    - a fetch costs a full tunnel round trip (~tens of ms) that scan
      and pallas dispatches pay identically, so the probe times a
      pipelined run of N calls per backend and reports the per-call
      DIFFERENCE — in the bad-tunnel regime pallas costs ~0.5-1 s/call
      extra, in the good regime the difference is ~0.
    """
    import jax

    # The first resolution can happen DURING jit tracing (the model code
    # calls resolved_backend() from inside the step being lowered, e.g.
    # profile_step's cost-analysis lower()).  Under omnistaging every jnp
    # op in that context returns a tracer, so the probe's own arrays must
    # be built under ensure_compile_time_eval or the host fetch raises
    # TracerArrayConversionError — which round 3 observed as a silent
    # fall-back to scan poisoning the whole session.
    with jax.ensure_compile_time_eval():
        return _measure_concrete()


def _measure_concrete() -> float:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from .sync import wait

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    @jax.jit
    def probe(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    @jax.jit
    def base(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    wait(probe(x))  # compile + first dispatch
    wait(base(x))
    limit = float(os.environ.get("SEQ2SEQ_PALLAS_DISPATCH_MS_MAX",
                                 _DEFAULT_MAX_MS))
    n = 8
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = base(y)
        wait(y)
        base_ms = (time.perf_counter() - t0) * 1e3 / n
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = probe(y)
        wait(y)
        pallas_ms = (time.perf_counter() - t0) * 1e3 / n
        samples.append(max(0.0, pallas_ms - base_ms))
        if samples[0] > 10.0 * limit:
            # the bad regime costs ~seconds per call; one probe decides
            break
    return statistics.median(samples)


class BackendSelector:
    """Measured scan-vs-pallas choice with re-probe hysteresis.

    ``measure`` and ``platform`` are injectable for tests (a synthetic
    latency flip must produce exactly one switch)."""

    def __init__(self, measure=None, platform=None):
        self._measure = measure or _default_measure
        self._platform = platform or _default_platform
        self._current: str | None = None
        self.decisions: list[dict] = []

    # -- public ---------------------------------------------------------
    def current(self) -> str:
        """The backend in effect (probing on first use in auto mode)."""
        forced = self._forced()
        if forced is not None:
            return forced
        if self._current is None:
            self.maybe_reprobe(context="init")
        return self._current

    def maybe_reprobe(self, context: str = "epoch") -> str:
        """Re-measure the dispatch latency and apply hysteresis.

        Returns the (possibly new) backend.  No-op for forced modes and
        on CPU (where Pallas would run in interpret mode)."""
        forced = self._forced()
        if forced is not None:
            self._current = forced
            return forced
        if self._platform() == "cpu":
            self._current = "scan"
            return "scan"
        limit = float(os.environ.get("SEQ2SEQ_PALLAS_DISPATCH_MS_MAX",
                                     _DEFAULT_MAX_MS))
        try:
            ms = self._measure()
        except Exception as e:
            # keep the prior choice if any; record WHY the probe failed
            # (a silently swallowed probe error cost round 3 a whole
            # profiling pass on the wrong backend)
            choice = self._current or "scan"
            self._record(context, None, choice, error=repr(e)[:200])
            return choice
        if self._current is None:
            choice = "pallas" if ms < limit else "scan"
        elif self._current == "pallas":
            choice = "scan" if ms > limit * _UP_FACTOR else "pallas"
        else:
            choice = "pallas" if ms < limit * _DOWN_FACTOR else "scan"
        self._record(context, ms, choice)
        return choice

    def reset(self) -> None:
        """Drop state so the next use re-resolves (tests, env changes)."""
        self._current = None
        self.decisions.clear()

    def report(self) -> dict:
        out = {"rnn_backend": self.current()}
        if self.decisions:
            last = self.decisions[-1]
            if last["dispatch_ms"] is not None:
                out["pallas_dispatch_ms"] = last["dispatch_ms"]
            out["decision_trail"] = list(self.decisions)
        return out

    # -- internals ------------------------------------------------------
    @staticmethod
    def _forced() -> str | None:
        mode = os.environ.get("SEQ2SEQ_RNN_BACKEND", "auto")
        return mode if mode in ("scan", "pallas") else None

    def _record(self, context: str, ms: float | None, choice: str,
                error: str | None = None) -> None:
        switched = self._current is not None and choice != self._current
        rec = {
            "context": context,
            "dispatch_ms": None if ms is None else round(ms, 3),
            "backend": choice,
            "switched": switched,
        }
        if error is not None:
            rec["error"] = error
        self.decisions.append(rec)
        self._current = choice


SELECTOR = BackendSelector()


def resolve_rnn_backend() -> str:
    """Compat shim for the round-1/2 API: the currently resolved backend."""
    return SELECTOR.current()


# scripts/tests call resolve_rnn_backend.cache_clear() to force
# re-resolution after flipping SEQ2SEQ_RNN_BACKEND
resolve_rnn_backend.cache_clear = SELECTOR.reset  # type: ignore[attr-defined]


def pallas_dispatch_ms() -> float:
    """One fresh dispatch-latency measurement, in ms (diagnostics)."""
    return _default_measure()


def backend_report() -> dict:
    """For bench/diagnostic JSON: the resolved backend, the last measured
    dispatch latency, and the full probe/decision trail."""
    return SELECTOR.report()
