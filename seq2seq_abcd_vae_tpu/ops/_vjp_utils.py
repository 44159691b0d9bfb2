"""Symbolic-zero helpers for the layer kernels' custom VJPs.

The encoder consumes only the FINAL states of its last recurrent layer
(models/encoder.py:_flatten_final; reference model.py:60-66 flattens the
final hidden state) — the per-step outputs `outs` are dead there.  With
a plain ``jax.custom_vjp``, JAX materializes a dense zero cotangent for
the unused (T, [2,] B, H) output — 536 MB at the publication shape — and
the backward kernel streams it from HBM just to add zeros.  Declaring
``symbolic_zeros=True`` lets the backward detect the dead cotangent at
trace time and substitute a single resident (1, [2,] B, H) zero block
(constant BlockSpec index map): no HBM tensor, no per-step stream.
Measured in the round-3 device trace: the zero broadcast alone was
~0.8 ms/step, plus the equivalent read traffic in the backward kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero


def is_sym_zero(ct) -> bool:
    return isinstance(ct, SymbolicZero)


def primals(*args):
    """Unwrap CustomVJPPrimal objects (symbolic_zeros=True fwd calling
    convention) to their values."""
    return tuple(a.value for a in args)


def dense_small(ct, shape, dtype):
    """Materialize a small (state-sized) cotangent if symbolic."""
    return jnp.zeros(shape, dtype) if isinstance(ct, SymbolicZero) else ct
