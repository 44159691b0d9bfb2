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

import jax.numpy as jnp


def mxu_dot(a, b, precision):
    if precision == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)
