"""Shared MXU dot helper for the Pallas kernels.

All kernel matmuls accumulate in f32.  ``precision`` is either a
``jax.lax.Precision`` (threaded from the session's matmul-precision
setting, models/rnn.py:kernel_precision) or the string ``"bf16"``:
cast both operands to bf16 for one-pass MXU issue — the speed-of-light
mode; carries, gate nonlinearities, and reductions stay f32 on the VPU.
Hardware A/B for the bf16 mode is recorded in BASELINE.md (VERDICT
round-2 lever (a): bf16 recurrence with f32 carries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mxu_dot(a, b, precision):
    if precision == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _dgen(a, b, dims, precision):
    dn = (dims, ((), ()))
    if precision == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dn, precision=precision,
                               preferred_element_type=jnp.float32)


def mxu_dot_nt(a, b, precision):
    """a @ b.T without materializing the transpose.

    Inside a Pallas kernel an explicit ``.T`` is a real VPU relayout of
    the operand at EVERY grid step — for the backward kernels that means
    re-transposing the VMEM-resident weight (up to 1.5 MB) T times.
    ``dot_general`` with the contraction on dim 1 of both operands lets
    the MXU stream the right-hand operand transposed natively.
    """
    return _dgen(a, b, (((1,), (1,))), precision)


def mxu_dot_tn(a, b, precision):
    """a.T @ b (contract dim 0 of both) — same rationale as mxu_dot_nt;
    used for the per-step weight-gradient accumulations (x.T @ dz)."""
    return _dgen(a, b, (((0,), (0,))), precision)
